"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through the noop sink so the full plan executes
(count() would let Catalyst prune projections; collect() would measure
driver transfer).

Env knobs:
  SPARK_GRAFT_SF_DIR            parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS              local[N] threads
  SPARK_GRAFT_BENCH_PASSES      passes per query, min reported (default 2)
  SPARK_GRAFT_BENCH_MAX_LOAD    1-min loadavg bar for "quiet" (default 4.0)
  SPARK_GRAFT_BENCH_WAIT_QUIET  seconds to WAIT (bounded) for loadavg to
                                drop under the bar before starting; 0 =
                                warn-only (default).  Timeout is logged
                                and stamped as quiet_wait_timed_out.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "filter_predicate",
    "dedupe_first_wins",
    "switch_routing",
    "lookup_join_enrich",
    "sharded_join_full_outer",
    "window_tumbling",
    "topk_per_group",
    "bloblang_mapping",
    "bloblang_compiled",
    "yaml_config_stream",
    "string_methods",
    "sessionize",
    "window_sliding",
    "parse_log_syslog",
    "text_quality_langid",
    "batch_functions",
    "similarity_lsh_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "text_repetition",
    "mixture_sample",
    "decontaminate",
    "pack_sequences",
    "dedup_ngram_jaccard",
    "similarity_topk",
    "similarity_ivf_topk",
    "text_analysis",
    "doc_fingerprint",
    "pii_scrub",
    "jq_general",
    "jq_path_fastpath",
    "unarchive_json_map",
    "asof_join_enrich",
    "xml_to_json",
]


def main() -> None:
    import __spark_entry__ as entry
    from benthos_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    # Contention guard (round-5 lesson: a contended re-run silently
    # replaced a quiet-window artifact and made the repo's scale
    # evidence self-contradictory).  Stamp the 1-min loadavg at start
    # and end; warn loudly — to stderr, the JSON line stays parseable —
    # when the window was NOT quiet, so a dirty artifact is visibly
    # dirty.  SPARK_GRAFT_BENCH_MAX_LOAD (default 4.0) sets the bar.
    #
    # SPARK_GRAFT_BENCH_WAIT_QUIET=<secs> (r6 verdict ask #6): instead
    # of merely warning, WAIT — bounded by <secs> — until the 1-min
    # loadavg drops under the bar before starting, so driver-invoked
    # artifacts land quiet without manual babysitting.  On timeout the
    # run proceeds (a noisy artifact beats no artifact) and the bounded
    # wait is logged + stamped in the JSON (`quiet_wait_timed_out`).
    #
    # r7 verdict ask #5: the wait is now ON BY DEFAULT (600 s at
    # MAX_LOAD 1.5) — the driver invokes bench.py with no env vars, so
    # an opt-in default could never help the artifact it was built
    # for.  Opt out with SPARK_GRAFT_BENCH_WAIT_QUIET=0 when iterating.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "1.5"))
    wait_quiet = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_QUIET",
                                      "600"))
    quiet_wait_timed_out = False
    if wait_quiet > 0 and os.getloadavg()[0] > max_load:
        deadline = time.monotonic() + wait_quiet
        print(f"waiting up to {wait_quiet:.0f}s for 1-min loadavg "
              f"< {max_load} (now {os.getloadavg()[0]:.2f})",
              file=sys.stderr)
        while os.getloadavg()[0] > max_load:
            if time.monotonic() >= deadline:
                quiet_wait_timed_out = True
                print(f"quiet-window wait timed out after "
                      f"{wait_quiet:.0f}s at loadavg "
                      f"{os.getloadavg()[0]:.2f} — proceeding noisy",
                      file=sys.stderr)
                break
            time.sleep(min(15.0, max(1.0, deadline - time.monotonic())))
    load_start = os.getloadavg()[0]
    if load_start > max_load:
        print(f"WARNING: 1-min loadavg {load_start:.2f} > {max_load} "
              "at bench start — results will be contention-noisy; "
              "re-run in a quiet window before committing artifacts",
              file=sys.stderr)

    spark = get_spark("bench")
    # base_queries = one operator per name; queries() wraps some names
    # into correctness-suite unions that re-run members (driver gate)
    qs = getattr(entry, "base_queries", entry.queries)()
    timings: dict[str, float] = {}

    # warm the JVM once, outside the timed region: file listings for
    # every table, plus one shuffle so the shuffle machinery and
    # whole-stage codegen paths are initialized before the first query
    from pyspark.sql import functions as F
    for t in ("lineitem", "orders", "customer", "documents",
              "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.range(0, 1 << 20).groupBy(
        F.pmod(F.col("id"), F.lit(32))).count().collect()

    # FULL suite: every registered query runs and is timed — the
    # HEADLINE list only pins the ordering of the r1-comparable subset
    # so per-query regressions line up across rounds; new queries
    # append in name order.  Two passes, min per query: the container
    # shares a host, and single-pass walltimes swing 3-5× with
    # neighbor load — min-of-2 reports the engine, not the neighbors.
    suite = HEADLINE + sorted(n for n in qs if n not in HEADLINE)
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    for _ in range(passes):
        for name in suite:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, t), t)

    # Suite hosts (queries() entries that union-merge members for the
    # driver's 50-row correctness gate) re-run every member, so their
    # wall time double-charges the per-operator numbers above.  Timed
    # under a separate key, excluded from the headline totals, so BENCH
    # vs CORRECTNESS timing lines up.  Min-of-passes like the per-
    # operator loop: a single end-of-suite shot swung 3-11× run-to-run
    # with accumulated JVM session state (r6 observed the sf1 host wall
    # at 97s and 167s for identical code) — the min reports the plan.
    suite_hosts: dict[str, float] = {}
    if hasattr(entry, "base_queries"):
        merged = {n: f for n, f in entry.queries().items()
                  if qs.get(n) is not f}     # unmerged: timed above
        for _ in range(passes):
            for name, fn in merged.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                t = round(time.perf_counter() - t0, 3)
                suite_hosts[name] = min(suite_hosts.get(name, t), t)

    total = round(sum(timings.values()), 3)
    # Summary fields FIRST, bulky per-query dicts LAST: the driver
    # captures a bounded tail, and the r8 artifact lost its headline to
    # truncation mid-`queries`.  With this ordering a line cut anywhere
    # past the first ~300 bytes still yields the headline via a regex
    # scan even though strict json.loads fails.  Field SET is unchanged
    # except the additive "cpus" stamp (the driver re-runs at lower
    # core counts; the artifact should say which run it was).
    print(json.dumps({
        "metric": "full_query_suite_wall",
        "value": total,
        "unit": "sec",
        "n_queries": len(suite),
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "passes": passes,
        "agg": "min",
        "headline_subset_wall": round(
            sum(timings[n] for n in HEADLINE), 3),
        "suite_hosts_wall": round(sum(suite_hosts.values()), 3),
        # own-Spark load is included in the end stamp; "quiet" means
        # the START was below the bar (nothing else was running) —
        # scale_report refuses to trust artifacts where it wasn't
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "quiet_window": load_start <= max_load,
        "quiet_wait_timed_out": quiet_wait_timed_out,
        "queries": timings,
        "suite_hosts": suite_hosts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
