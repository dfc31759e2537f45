"""Extract NewExampleSpec(...) triplets from the reference's Bloblang
registry (internal/bloblang/query/*.go) into a JSON vector file.

Each example spec documents (mapping, input, expected-output) pairs —
the reference's own statement of WHAT each method/function computes.
We extract the *data*, never the implementation: the output is a list
of {name, file, line, mapping, cases: [[input, output], ...]} records
consumed by tests/test_ref_example_vectors.py.

Usage: python tools/extract_ref_examples.py > tests/golden/ref_bloblang_examples.json
"""

from __future__ import annotations

import glob
import json
import re
import sys

QUERY_DIR = "/root/reference/internal/bloblang/query"


def parse_go_string(src: str, i: int) -> tuple[str, int] | None:
    """Parse a Go string literal (backtick raw or double-quoted) at
    src[i]; returns (value, next_index) or None."""
    ch = src[i]
    if ch == "`":
        j = src.index("`", i + 1)
        return src[i + 1:j], j + 1
    if ch == '"':
        out = []
        j = i + 1
        while j < len(src):
            c = src[j]
            if c == "\\":
                nxt = src[j + 1]
                mapping = {"n": "\n", "t": "\t", '"': '"', "\\": "\\",
                           "r": "\r"}
                if nxt in mapping:
                    out.append(mapping[nxt])
                    j += 2
                    continue
                if nxt == "u":
                    out.append(chr(int(src[j + 2:j + 6], 16)))
                    j += 6
                    continue
                out.append(nxt)
                j += 2
                continue
            if c == '"':
                return "".join(out), j + 1
            out.append(c)
            j += 1
    return None


def split_args(src: str, i: int) -> tuple[list, int]:
    """Split the top-level arguments of a call starting at src[i] == '('.
    Returns (args, next_index); each arg is either ('str', value) for a
    plain string literal or ('other', text)."""
    assert src[i] == "("
    depth = 1
    i += 1
    args: list = []
    buf: list[str] = []
    cur_str: str | None = None
    saw_concat = False

    def flush():
        nonlocal cur_str, saw_concat
        text = "".join(buf).strip()
        if cur_str is not None and not text and not saw_concat:
            args.append(("str", cur_str))
        elif cur_str is not None:
            args.append(("other", text))
        elif text:
            args.append(("other", text))
        buf.clear()
        cur_str = None
        saw_concat = False

    while i < len(src):
        c = src[i]
        if c in "`\"":
            lit = parse_go_string(src, i)
            if lit is None:
                buf.append(c)
                i += 1
                continue
            val, ni = lit
            if cur_str is None and not "".join(buf).strip():
                cur_str = val
            else:
                cur_str = (cur_str or "") + val  # concatenated literals
                saw_concat = False
            i = ni
            continue
        if c == "+":
            saw_concat = True
            i += 1
            continue
        if c in "([{":
            depth += 1
            buf.append(c)
        elif c in ")]}":
            depth -= 1
            if depth == 0:
                flush()
                return args, i + 1
            buf.append(c)
        elif c == "," and depth == 1:
            flush()
        else:
            buf.append(c)
        i += 1
    raise ValueError("unbalanced call")


def spec_name(src: str, call_start: int) -> str:
    """Name of the enclosing New*Spec("name", ...) registration."""
    window = src[max(0, call_start - 4000):call_start]
    names = re.findall(
        r'New(?:Method|Function|DeprecatedMethod|DeprecatedFunction|'
        r'HiddenMethod|HiddenFunction)Spec\(\s*\n?\s*(?:Function[A-Za-z]+'
        r',\s*\n?\s*)?"([a-z0-9_]+)"', window)
    return names[-1] if names else "unknown"


def main() -> int:
    records = []
    for path in sorted(glob.glob(f"{QUERY_DIR}/*.go")):
        if path.endswith("_test.go"):
            continue
        src = open(path).read()
        short = path.split("/internal/")[-1]
        for m in re.finditer(r"NewExampleSpec\(", src):
            start = m.end() - 1
            line = src[:m.start()].count("\n") + 1
            try:
                args, _ = split_args(src, start)
            except Exception as e:  # noqa: BLE001
                print(f"skip {short}:{line}: {e}", file=sys.stderr)
                continue
            strs = [a[1] for a in args if a[0] == "str"]
            if len(strs) < 2:
                continue
            # args: summary, mapping, then alternating input/output
            mapping = strs[1]
            io = strs[2:]
            cases = [[io[i], io[i + 1]]
                     for i in range(0, len(io) - 1, 2)]
            records.append({
                "name": spec_name(src, m.start()),
                "file": f"internal/{short}",
                "line": line,
                "mapping": mapping,
                "cases": cases,
            })
    json.dump(records, sys.stdout, indent=1)
    print(f"\n{len(records)} example specs, "
          f"{sum(len(r['cases']) for r in records)} io cases",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
