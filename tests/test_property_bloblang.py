"""Property-based tests: the Bloblang→Column compiler against a plain
Python evaluation of the same expressions (the reference has no
property testing — SURVEY §5; hypothesis gives us differential coverage
table-driven cases can't).

One Spark job per example would be slow; each example generates a BATCH
of rows and the whole batch runs as one collect."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from benthos_spark.bloblang import map_text

# Soak/parity tier: excluded from the default fast run the driver's
# verify budget can finish (pytest.ini); run with -m slow.
pytestmark = __import__('pytest').mark.slow

_INT = st.integers(min_value=-10_000, max_value=10_000)
# Restrict to codepoints whose case mappings agree between Python's
# Unicode tables and the JVM's: newer Unicode versions add mappings
# (e.g. U+019B 'ƛ' → U+A7DC in Unicode 16) that JDK 17 has and
# CPython 3.11 lacks, so unrestricted Latin Extended-B is flaky.
_TXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           max_codepoint=0xFF),
    min_size=0, max_size=24)

MAPPING = """
root.add = this.a + this.b
root.mul = this.a * this.b
root.cmp = this.a > this.b
root.cond = if this.a >= 0 { this.a } else { 0 - this.a }
root.up = this.s.uppercase()
root.low = this.s.lowercase()
root.n = this.s.length()
root.cat = this.s + "-" + this.s
root.rev_rt = this.s.reverse().reverse()
root.coal = this.maybe | -1
"""


def _expected(a: int, b: int, s: str, maybe):
    return {
        "add": a + b, "mul": a * b, "cmp": a > b,
        "cond": a if a >= 0 else -a,
        "up": s.upper(), "low": s.lower(), "n": len(s),
        "cat": f"{s}-{s}", "rev_rt": s,
        "coal": maybe if maybe is not None else -1,
    }


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_INT, _INT, _TXT, st.none() | _INT),
                min_size=1, max_size=25))
def test_compiler_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        rows, "a LONG, b LONG, s STRING, maybe LONG")
    got = map_text(df, MAPPING).collect()
    assert len(got) == len(rows)
    for r, (a, b, s, maybe) in zip(got, rows):
        exp = _expected(a, b, s, maybe)
        actual = {k: r[k] for k in exp}
        # Python str.upper()/lower() and JVM agree on the Latin ranges
        # the generator is restricted to; int arithmetic exact in range
        assert actual == exp, f"in={a, b, s, maybe}"


@settings(max_examples=12, deadline=None)
@given(st.lists(_TXT, min_size=1, max_size=30),
       st.sampled_from(["|", ";", "#"]))
def test_join_split_roundtrip(spark, parts, sep):
    # join(sep).split(sep) is identity when no part contains sep
    parts = [p for p in parts if sep not in p] or ["x"]
    df = spark.createDataFrame([(parts,)], "xs ARRAY<STRING>")
    out = map_text(
        df, f'root.rt = this.xs.join("{sep}").split("{sep}")').collect()
    assert out[0].rt == parts


# ---- jq: the two independent tiers must agree on path queries ----

_LEAF = st.one_of(st.integers(-1000, 1000), st.booleans(),
                  st.text("abc", max_size=6), st.none())
_DOC = st.recursive(
    _LEAF, lambda ch: st.dictionaries(st.sampled_from("pqrs"), ch,
                                      max_size=3), max_leaves=8)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.dictionaries(st.sampled_from("pqrs"), _DOC,
                                max_size=3), min_size=1, max_size=8),
       st.lists(st.sampled_from("pqrs"), min_size=1, max_size=3))
def test_jq_fast_path_matches_interpreter(spark, docs, path):
    import json
    from benthos_spark.operators.jq import (jq_eval_text, jq_transform,
                                            parse_jq)
    from benthos_spark.operators.jq import JQError
    query = "." + ".".join(path)
    prog = parse_jq(query)
    rows = [(json.dumps(d),) for d in docs]
    df = spark.createDataFrame(rows, "content STRING")
    fast = [(json.loads(r.content), r._error is not None)
            for r in jq_transform(df, query).collect()]
    interp = []
    for (t,) in rows:
        try:
            interp.append((json.loads(jq_eval_text(prog, t)), False))
        except JQError:
            interp.append((json.loads(t), True))  # content unchanged
    assert fast == interp


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2ff),
    max_size=40), min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_bpe_lossless_roundtrip(texts):
    """Property: BPE encoding is lossless — concatenating a text's
    tokens (end-of-word markers stripped) reproduces exactly the
    pre-tokenizer's matches, for arbitrary unicode input."""
    from benthos_spark.llm.tokenizer import (_PRETOK, bpe_encode_batch,
                                             bpe_train)
    merges = bpe_train(texts, n_merges=30)
    for t, toks in zip(texts, bpe_encode_batch(texts, merges)):
        assert "".join(toks).replace("</w>", "") == \
               "".join(_PRETOK.findall(t))
