"""Extract the reference's textual mapping-parser test table
(internal/bloblang/parser/mapping_parser_test.go TestMappings) into
JSON vectors: {name, line, mapping, index, input: [{content, meta}],
output: {content, meta}}.

The two import-fixture files the Go harness materializes are emitted
as placeholders ({GOOD_MAP_FILE}, {DIRECT_MAP_FILE}) for the runner
to substitute with temp paths.

Usage: python tools/extract_ref_parser_tests.py \
           > tests/golden/ref_parser_mappings.json
"""

from __future__ import annotations

import json
import re
import sys

SRC = ("/root/reference/internal/bloblang/parser/"
       "mapping_parser_test.go")

GOOD_MAP_BODY = 'map foo {\n  foo = "this is valid"\n  nested = this\n}'
DIRECT_MAP_BODY = "root.nested = this"


def _read_go_string(text: str, i: int) -> tuple[str, int]:
    """Parse a Go string literal starting at text[i] (backtick raw or
    double-quoted); returns (value, next_index)."""
    if text[i] == "`":
        j = text.index("`", i + 1)
        return text[i + 1:j], j + 1
    if text[i] == '"':
        out = []
        j = i + 1
        while text[j] != '"':
            c = text[j]
            if c == "\\":
                nxt = text[j + 1]
                mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"',
                          "\\": "\\", "`": "`", "'": "'"}.get(nxt)
                if mapped is None:
                    raise ValueError(f"escape \\{nxt} at {j}")
                out.append(mapped)
                j += 2
            else:
                out.append(c)
                j += 1
        return "".join(out), j + 1
    raise ValueError(f"not a string at {i}: {text[i:i+20]!r}")


def _skip_ws(text: str, i: int) -> int:
    while i < len(text) and text[i] in " \t\n,":
        i += 1
    return i


def _block_end(text: str, i: int) -> int:
    """i points at '{'; return index just past the matching '}'.
    Go string literals are skipped."""
    depth = 0
    while i < len(text):
        c = text[i]
        if c in "`\"":
            _, i = _read_go_string(text, i)
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced braces")


def _parse_part(text: str) -> dict:
    """Parse the inside of a part{...} body: Content / Meta fields."""
    part = {"content": "", "meta": {}}
    m = re.search(r"Content:\s*", text)
    if m:
        v, _ = _read_go_string(text, m.end())
        part["content"] = v
    m = re.search(r"Meta:\s*map\[string\]string\{", text)
    if m:
        body = text[m.end() - 1:]
        end = _block_end(body, 0)
        inner = body[1:end - 1]
        i = 0
        while True:
            i = _skip_ws(inner, i)
            if i >= len(inner):
                break
            k, i = _read_go_string(inner, i)
            i = _skip_ws(inner, inner.index(":", i) + 1)
            v, i = _read_go_string(inner, i)
            part["meta"][k] = v
    return part


def _parse_mapping_field(text: str, i: int) -> str:
    """Parse the value of `mapping:` — a string literal or
    fmt.Sprintf(<literal>, <var>[, <var>])."""
    i = _skip_ws(text, i)
    if text.startswith("fmt.Sprintf(", i):
        i += len("fmt.Sprintf(")
        i = _skip_ws(text, i)
        tmpl, i = _read_go_string(text, i)
        j = text.index(")", i)
        args = [a.strip() for a in text[i:j].split(",") if a.strip()]
        for a in args:
            ph = {"goodMapFile": "{GOOD_MAP_FILE}",
                  "directMapFile": "{DIRECT_MAP_FILE}"}.get(a)
            if ph is None:
                raise ValueError(f"unknown Sprintf arg {a!r}")
            tmpl = tmpl.replace("%v", ph, 1)
        return tmpl
    v, _ = _read_go_string(text, i)
    return v


def extract() -> list[dict]:
    src = open(SRC).read()
    fn = src[src.index("func TestMappings"):]
    table = fn[fn.index("tests := map[string]struct {"):]
    # cases start after the struct definition's closing "}{"
    start = table.index("}{") + 1
    end = _block_end(table, start)
    body = table[start + 1:end - 1]
    line0 = (src[:src.index("func TestMappings")].count("\n")
             + fn[:fn.index("tests := map")].count("\n")
             + table[:start].count("\n") + 1)

    out = []
    i = 0
    while True:
        m = re.compile(r'"((?:[^"\\]|\\.)*)":\s*\{').search(body, i)
        if not m:
            break
        name = m.group(1)
        blk_start = m.end() - 1
        blk_end = _block_end(body, blk_start)
        blk = body[blk_start + 1:blk_end - 1]
        i = blk_end

        case = {"name": name,
                "line": line0 + body[:m.start()].count("\n") + 1}
        mm = re.search(r"mapping:\s*", blk)
        case["mapping"] = _parse_mapping_field(blk, mm.end())
        mi = re.search(r"index:\s*(\d+)", blk)
        case["index"] = int(mi.group(1)) if mi else 0

        pin = re.search(r"input:\s*\[\]part\{", blk)
        parts = []
        if pin:
            seg = blk[pin.end() - 1:]
            seg = seg[:_block_end(seg, 0)]
            j = 1
            while True:
                j = _skip_ws(seg, j)
                if j >= len(seg) - 1 or seg[j] != "{":
                    break
                pend = _block_end(seg, j)
                parts.append(_parse_part(seg[j + 1:pend - 1]))
                j = pend
        case["input"] = parts

        po = re.search(r"output:\s*&?part\{", blk)
        if not po:
            continue  # error-only case: no output part to compare
        seg = blk[po.end() - 1:]
        seg = seg[:_block_end(seg, 0)]
        case["output"] = _parse_part(seg[1:-1])
        out.append(case)
    return out


def main() -> int:
    vectors = extract()
    json.dump(vectors, sys.stdout, indent=1)
    sys.stdout.write("\n")
    print(f"{len(vectors)} vectors", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
