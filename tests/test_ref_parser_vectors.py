"""The reference's textual mapping-parser test table run verbatim.

Vectors extracted by tools/extract_ref_parser_tests.py from
internal/bloblang/parser/mapping_parser_test.go (TestMappings):
mapping text applied to the input batch, the indexed output part
compared on content AND the FULL metadata map (exact equality),
mirroring `exec.MapPart(index, msg)` + `assert.Equal(output, newPart)`.
"""

from __future__ import annotations

import json
import os

import pytest

# Soak/parity tier: excluded from the default fast run the driver's
# verify budget can finish (pytest.ini); run with -m slow.
pytestmark = __import__('pytest').mark.slow

VECTORS = os.path.join(os.path.dirname(__file__), "golden",
                       "ref_parser_mappings.json")

# name → documented deviation (shrinking this list is progress)
SKIP: dict[str, str] = {}

GOOD_MAP = 'map foo {\n  foo = "this is valid"\n  nested = this\n}'
DIRECT_MAP = "root.nested = this"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_parser_maps")
    (d / "good_map.blobl").write_text(GOOD_MAP)
    (d / "direct_map.blobl").write_text(DIRECT_MAP)
    return d


def _cases():
    return [pytest.param(c, id=c["name"].replace(" ", "_"))
            for c in json.load(open(VECTORS))]


@pytest.mark.parametrize("case", _cases())
def test_reference_parser_mapping(spark, case, fixture_dir):
    if case["name"] in SKIP:
        pytest.skip(SKIP[case["name"]])
    from benthos_spark.testkit import _apply_target, _input_df

    mapping = (case["mapping"]
               .replace("{GOOD_MAP_FILE}",
                        str(fixture_dir / "good_map.blobl"))
               .replace("{DIRECT_MAP_FILE}",
                        str(fixture_dir / "direct_map.blobl")))
    batch = [{"content": p["content"], "metadata": p["meta"]}
             for p in case["input"]]
    df = _input_df(spark, batch)
    out = _apply_target(
        spark, df, {"name": case["name"], "input_batch": batch,
                    "target_mapping": mapping})
    rows = (out.orderBy("part_index").collect()
            if "part_index" in out.columns else out.collect())
    assert len(rows) > case["index"], "indexed part missing from output"
    d = rows[case["index"]].asDict(recursive=True)
    src = f"mapping_parser_test.go:{case['line']}"
    assert d.get("content") == case["output"]["content"], \
        (src, mapping, d)
    got_meta = dict(d.get("meta") or {})
    assert got_meta == case["output"]["meta"], (src, mapping, got_meta)
