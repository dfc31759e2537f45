"""Generate a scaled-up copy of the driver's synthetic tables for
scale validation (VERDICT r3 ask #1).

The driver materializes sf{0.001,0.01,0.1} read-only under
/root/testdata (TESTDATA.md).  This tool regenerates the same star
schema + LLM tables at an arbitrary scale factor from the observed
sf0.1 distributions (FIXTURES.md section B), so the full bench can run
at sf1 (10x) and expose super-linear scaling in any operator.

Row counts scale linearly with sf (sf0.1 counts x 10 x sf):
  customer 15k/0.1sf, supplier 1k, part 20k, orders 150k,
  lineitem ~600k (4.075 lines/order), events 100k (1.5k users),
  documents 5k, embeddings 2k.  region/nation stay fixed.

Workload-relevant properties preserved:
  - documents: 31-word salad vocab, 5 langs (en-heavy), 20 sources,
    ~0.16% exact-dup rate and ~4.5% near-dup (mutated-copy) rate so
    the dedup operators find non-degenerate clusters;
  - embeddings: 64-dim float, 10 Gaussian clusters keyed by label;
  - events: 30-day ts range, 5 event types, {"k": int} props JSON;
  - orders/lineitem: 1995-2001 dates, ~4 lines/order fan-out,
    contiguous int64 keys referencing customer/part/supplier.

Usage: python tools/gen_scale_data.py [SF] [OUTDIR] [--salad]
                                      [--boilerplate]
  default SF=1 OUTDIR=testdata_sf{SF} (repo root; `bp` suffix with
  --boilerplate); documents use the open-vocabulary Zipf mode unless
  --salad restores the legacy 31-word fixture (whose trigram space
  saturates by ~50k docs — see SCALE.md).

--boilerplate (r6 verdict ask #2) is the skew stress: 10% of
  documents are near-identical copies of ONE ~60-word template (half
  verbatim, half with a single substituted word), which lands them in
  a handful of mega band-buckets — the license-header / site-chrome
  shape that makes all-pairs LSH emission go quadratic at 100 TB.
  Star edges must stay linear on this fixture; SCALE.md records the
  measured curve.
Deterministic at a given (sf, vocab mode, boilerplate) (seed 1042).
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
])
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "scroll", "login"]
BRANDS = [f"Brand#{i}" for i in range(1, 26)]
# match the driver fixtures' vocab exactly (TESTDATA.md tables) so the
# TPC-H predicates (p_type='ECONOMY', p_name LIKE '%bolt%', NATION_1)
# select non-empty slices at every scale
TYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
PART_ADJ = ["small", "large", "red", "blue", "hot", "cold", "old", "new"]
PART_NOUN = ["ring", "bolt", "plate", "gear", "widget", "gizmo"]


def _write(out: str, name: str, table: pa.Table) -> None:
    """Write `name.parquet` — a single file when small, else a
    DIRECTORY of ~16 MB part files (Spark reads either transparently).
    A 100 TB table arrives as tens of thousands of objects, never one
    file; a single >128 MB local file would scan as ONE partition
    (spark.sql.files.maxPartitionBytes) and serialize every query,
    which is a fixture artifact, not an engine property."""
    path = os.path.join(out, f"{name}.parquet")
    if os.path.isfile(path):
        os.remove(path)
    elif os.path.isdir(path):
        import shutil
        shutil.rmtree(path)
    # Row groups are the parquet split unit: a single-group file scans
    # as ONE task no matter what maxPartitionBytes says, so aim for
    # ≥32 groups on any table big enough to matter.
    rg = max(4096, table.num_rows // 32)
    # nbytes is the in-memory Arrow size; parquet compresses ~4x for
    # this data, so 64 MB in-memory ≈ 16 MB on disk per part file
    nbytes = table.nbytes
    target = 64 << 20
    if nbytes <= 2 * target:
        pq.write_table(table, path, row_group_size=rg)
    else:
        os.makedirs(path, exist_ok=True)
        n_shards = (nbytes + target - 1) // target
        rows_per = (table.num_rows + n_shards - 1) // n_shards
        for i in range(n_shards):
            pq.write_table(table.slice(i * rows_per, rows_per),
                           os.path.join(path, f"part-{i:05d}.parquet"),
                           row_group_size=rg)
    print(f"  {name}: {table.num_rows} rows")


def gen(sf: float, out: str, vocab_mode: str = "zipf",
        boilerplate: bool = False) -> None:
    rng = np.random.default_rng(1042)
    os.makedirs(out, exist_ok=True)
    k = sf / 0.1  # multiplier over the observed sf0.1 counts

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    nat = [f"NATION_{i}" for i in range(25)]
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": nat,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(15000 * k)
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    n_supp = int(1000 * k)
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    n_part = int(20000 * k)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": [f"{PART_ADJ[a]} {PART_NOUN[b]}" for a, b in zip(
            rng.integers(0, len(PART_ADJ), n_part),
            rng.integers(0, len(PART_NOUN), n_part))],
        "p_brand": np.array(BRANDS)[rng.integers(0, 25, n_part)],
        "p_type": np.array(TYPES)[rng.integers(0, len(TYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))

    n_ord = int(150000 * k)
    day_ns = 86400 * 10**9
    o_dates = (np.datetime64("1995-01-01").astype("datetime64[ns]")
               + (rng.integers(0, 2404, n_ord) * day_ns)
               .astype("timedelta64[ns]"))
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": np.array(["O", "F", "P"])[
            rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])],
        "o_totalprice": np.round(rng.uniform(850, 356000, n_ord), 2),
        "o_orderdate": pa.array(o_dates.astype("datetime64[us]")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: ~4.075 lines per order
    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_orderkey)
    l_linenumber = (np.arange(n_li, dtype=np.int64)
                    - np.repeat(np.cumsum(lines_per) - lines_per,
                                lines_per) + 1).astype(np.int32)
    l_ship = (np.repeat(o_dates, lines_per)
              + (rng.integers(1, 122, n_li) * day_ns)
              .astype("timedelta64[ns]"))
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(l_linenumber),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["A", "N", "R"])[
            rng.choice(3, n_li, p=[0.25, 0.5, 0.25])],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(l_ship.astype("datetime64[us]")),
    }))

    n_ev = int(100000 * k)
    n_users = int(1500 * k)
    ts = (np.datetime64("2024-01-01").astype("datetime64[ns]")
          + rng.integers(0, 30 * day_ns, n_ev).astype("timedelta64[ns]"))
    ts.sort()
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev)),
        "event_type": np.array(EVENT_TYPES)[
            rng.choice(5, n_ev, p=[0.35, 0.35, 0.1, 0.15, 0.05])],
        "value": np.round(rng.exponential(50, n_ev), 4),
        "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)],
    }))

    # documents: ~95% fresh, ~4.3% mutated near-dup of an earlier doc,
    # ~0.2% exact dup — mirrors sf0.1's observed rates.
    #
    # vocab modes (round-6 fix for trigram saturation): the original
    # 31-word "salad" fills all 31³ trigrams by ~50k docs, so at sf≥1
    # every shingle is corpus-frequent and rare-shingle Jaccard is
    # degenerate (SCALE.md).  "zipf" draws token IDs from a power-law
    # (np.zipf a=1.5, UNBOUNDED id space): the head ids map onto the
    # original 31 words (stopword-like, same as real text), the tail
    # mints fresh words ("w123"), so distinct vocab grows ~n^(2/3)
    # with the corpus and rare shingles keep carrying near-dup signal
    # at every scale — matching how real corpora behave.
    n_doc = int(5000 * k)

    def draw_words(n: int) -> list[str]:
        if vocab_mode == "salad":
            return list(VOCAB[rng.integers(0, len(VOCAB), n)])
        ids = rng.zipf(1.5, n)
        return [str(VOCAB[z - 1]) if z <= len(VOCAB) else f"w{z}"
                for z in ids]

    # --boilerplate: one fixed template; 10% of docs are it verbatim
    # (p=0.05) or with a single substituted word (p=0.05).  A single
    # substitution shifts only ~3 of ~58 trigram shingles, so most
    # variants still agree with the template on most minhash bands —
    # the corpus gets a few THOUSAND-member band buckets instead of
    # the organic tail, exactly the shape where all-pairs emission is
    # C(m,2) and star edges are m-1.  The band sits DISJOINT above the
    # organic dup/mutate bands (r7 ADVICE: the old r < 0.10 check
    # consumed the organic r < 0.002 verbatim-dup draws, silently
    # dropping that population from bp fixtures).
    template = draw_words(60) if boilerplate else None

    docs: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if boilerplate and i > 10 and 0.045 <= r < 0.145:
            if r < 0.095:
                docs.append(" ".join(template))
            else:
                t = list(template)
                t[int(rng.integers(0, len(t)))] = draw_words(1)[0]
                docs.append(" ".join(t))
            continue
        if i > 10 and r < 0.002:
            docs.append(docs[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.045:
            base = docs[int(rng.integers(0, i))].split(" ")
            n_mut = max(1, len(base) // 12)
            for _ in range(n_mut):
                base[int(rng.integers(0, len(base)))] = draw_words(1)[0]
            docs.append(" ".join(base))
            continue
        n_words = int(rng.integers(9, 116))
        docs.append(" ".join(draw_words(n_words)))
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": docs,
        "lang": LANGS[rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(d) for d in docs],
                                     dtype=np.int64)),
    }))

    # embeddings: 10 Gaussian clusters in 64-dim
    n_emb = int(2000 * k)
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (centers[labels]
            + rng.normal(0, 0.35, (n_emb, 64))).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    vocab_mode = "salad" if "--salad" in sys.argv else "zipf"
    boilerplate = "--boilerplate" in sys.argv
    sf = float(args[0]) if args else 1.0
    sf_s = f"{sf:g}"
    suffix = "bp" if boilerplate else ""
    out = args[1] if len(args) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"testdata_sf{sf_s}{suffix}")
    print(f"generating sf{sf_s} ({vocab_mode} vocab"
          f"{', boilerplate skew' if boilerplate else ''}) -> {out}")
    gen(sf, out, vocab_mode, boilerplate)
