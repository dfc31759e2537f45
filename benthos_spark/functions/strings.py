"""Bloblang string methods (48 in the reference).

Reference: internal/bloblang/query/methods_strings.go (2066 LoC).
Everything here is a built-in JVM function — no Python UDFs — so the
whole string surface stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "capitalize", "uppercase", "lowercase", "trim", "trim_chars",
    "has_prefix", "has_suffix", "index_of", "reverse_str", "split",
    "join", "replace", "replace_many", "quote", "fmt",
    "re_match", "re_find_all", "re_replace", "re_find_first",
    "encode_base64", "decode_base64", "encode_hex", "decode_hex",
    "hash_sha256", "hash_sha512", "hash_sha1", "hash_md5",
    "hash_xxhash64", "parse_json", "parse_xml", "parse_csv_line", "length",
    "slice_str", "strip_html", "filepath_join", "filepath_split",
    "escape_url_query", "unescape_url_query",
]


def capitalize(c: Column) -> Column:
    """`.capitalize()` (methods_strings.go:61 → Go strings.Title):
    title-case the rune after every word separator and leave the REST
    UNTOUCHED — "DELTA" stays "DELTA".  F.initcap is NOT that: it
    lowercases the rest ("DELTA" → "Delta"; r7 fuzzer find #3).

    Separator per Go strings.isSeparator: for ASCII, anything but
    [0-9A-Za-z_]; for non-ASCII, only White_Space (letters/digits are
    never separators).  So digits GLUE words ("x9y" → "X9y", not
    "X9Y") and Unicode letters title-case ("über" → "Über") — both
    were wrong under the r7 ASCII-only regex (r7 ADVICE).  The
    single-char guard keeps full-case-expanding runes (ß → "SS")
    untouched, matching Go's simple ToTitle mapping.  r8 ADVICE:
    upper() is not ToTitle for the titlecase digraphs (ǳ → ǲ, not
    Ǳ), Georgian mkhedruli (titlecase is itself, not Mtavruli), or
    the Greek prosgegrammeni composites (ᾀ → ᾈ) — those 85 runes
    route through the shared casemap.TITLE_MAP first (same table the
    interpreter uses, so the engines cannot diverge).  Deviation:
    astral-plane runes arrive as surrogate halves here (Java split
    semantics), so e.g. Deseret letters don't title-case."""
    from benthos_spark.bloblang.casemap import TITLE_MAP
    cs = F.split(c, "")
    tmap = F.create_map(*[F.lit(x) for kv in sorted(TITLE_MAP.items())
                          for x in kv])

    def _sep(p: Column) -> Column:
        # NULL prev (string start) is a separator, like Go's prev=' '
        return F.coalesce(
            F.when(p.rlike("^[\\x00-\\x7F]$"),
                   ~p.rlike("^[0-9A-Za-z_]$"))
            .otherwise(p.rlike("^\\p{IsWhite_Space}$")),
            F.lit(True))

    def _title(ch: Column, i: Column) -> Column:
        u = F.coalesce(F.element_at(tmap, ch), F.upper(ch))
        return F.when(_sep(F.get(cs, i - 1)) & (F.length(u) == 1),
                      u).otherwise(ch)

    return F.array_join(F.transform(cs, _title), "")


def uppercase(c: Column) -> Column:
    """`.uppercase()` (methods_strings.go:838)."""
    return F.upper(c)


def lowercase(c: Column) -> Column:
    """`.lowercase()` (methods_strings.go:868)."""
    return F.lower(c)


def trim(c: Column) -> Column:
    """`.trim()` whitespace (methods_strings.go:2031)."""
    return F.trim(c)


def trim_chars(c: Column, cutset: str) -> Column:
    """`.trim(cutset)` (methods_strings.go:2031).  NB: F.trim's
    two-arg form is (str, trimChars) — cutset second."""
    return F.trim(c, F.lit(cutset))


def has_prefix(c: Column, prefix: str) -> Column:
    """`.has_prefix()` (methods_strings.go:617)."""
    return F.startswith(c, F.lit(prefix))


def has_suffix(c: Column, suffix: str) -> Column:
    """`.has_suffix()` (methods_strings.go:650)."""
    return F.endswith(c, F.lit(suffix))


def index_of(c: Column, sub: str) -> Column:
    """`.index_of()` (methods_strings.go:431) — reference is 0-based,
    instr is 1-based, -1 on miss in both."""
    return F.instr(c, sub) - 1


def reverse_str(c: Column) -> Column:
    """`.reverse()` (methods_strings.go:1250)."""
    return F.reverse(c)


def split(c: Column, delim: str) -> Column:
    """`.split()` (methods_strings.go:1913) — literal delimiter, so the
    regex metachars are escaped before handing to F.split."""
    import re
    return F.split(c, re.escape(delim))


def join(arr: Column, delim: str = "") -> Column:
    """`.join()` (methods_strings.go:790)."""
    return F.array_join(arr, delim)


def replace(c: Column, old: str, new: str) -> Column:
    """`.replace()` (methods_strings.go:1515) — literal replace-all."""
    return F.replace(c, F.lit(old), F.lit(new))


def replace_many(c: Column, pairs: list[tuple[str, str]]) -> Column:
    """`.replace_many()` (methods_strings.go:1550)."""
    for old, new in pairs:
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


def quote(c: Column) -> Column:
    """`.quote()` (methods_strings.go:1469) — JSON-style quoting."""
    return F.to_json(F.struct(c.alias("v"))).substr(F.lit(6), F.length(c) + 1024)


def fmt(template: str, *cols: Column) -> Column:
    """`.format("%v…")` (methods_strings.go:595)."""
    return F.format_string(template, *cols)


def re_match(c: Column, pattern: str) -> Column:
    """`.re_match()` (methods_strings.go:1834)."""
    return c.rlike(pattern)


def re_find_first(c: Column, pattern: str, group: int = 0) -> Column:
    """first match of `.re_find_all` family (methods_strings.go:1614)."""
    return F.regexp_extract(c, pattern, group)


def re_find_all(c: Column, pattern: str, group: int = 0) -> Column:
    """`.re_find_all()` (methods_strings.go:1614) — full matches by
    default (Spark's idx defaults to capture group 1, which errors on
    group-less patterns)."""
    return F.regexp_extract_all(c, F.lit(pattern), F.lit(group))


def re_replace(c: Column, pattern: str, replacement: str) -> Column:
    """`.re_replace()` (methods_strings.go:1873)."""
    return F.regexp_replace(c, pattern, replacement)


def encode_base64(c: Column) -> Column:
    """`.encode("base64")` (methods_strings.go:89).  Spark's base64 MIME-
    chunks with CRLF every 76 chars (legacy behavior still on in some
    builds); Go's encoding/base64 does not — strip the chunking."""
    return F.translate(F.base64(c.cast("binary")), "\r\n", "")


def decode_base64(c: Column) -> Column:
    """`.decode("base64")` (methods_strings.go:184)."""
    return F.unbase64(c).cast("string")


def encode_hex(c: Column) -> Column:
    """`.encode("hex")` — lowercase like Go's hex.EncodeToString."""
    return F.lower(F.hex(c.cast("binary")))


def decode_hex(c: Column) -> Column:
    """`.decode("hex")`."""
    return F.unhex(c).cast("string")


def hash_sha256(c: Column) -> Column:
    """`.hash("sha256")` (methods_strings.go:683), hex digest."""
    return F.sha2(c.cast("binary"), 256)


def hash_sha512(c: Column) -> Column:
    """`.hash("sha512")`."""
    return F.sha2(c.cast("binary"), 512)


def hash_sha1(c: Column) -> Column:
    """`.hash("sha1")`."""
    return F.sha1(c.cast("binary"))


def hash_md5(c: Column) -> Column:
    """`.hash("md5")`."""
    return F.md5(c.cast("binary"))


def hash_xxhash64(c: Column) -> Column:
    """`.hash("xxhash64")` — Spark's native 64-bit xxhash; the scale
    path for hash_sample/dedupe keys (JVM, codegen'd)."""
    return F.xxhash64(c)


def _xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 over raw bytes, seed 0 — clean-room from the published
    xxHash specification (the reference's .hash("xxhash64") uses the
    canonical algorithm; Spark's builtin xxhash64 hashes its own row
    serialization with seed 42, a different value)."""
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, \
        0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    M = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def rnd(acc, inp):
        return (rotl((acc + inp * P2) & M, 31) * P1) & M

    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + P1 + P2) & M, (seed + P2) & M
        v3, v4 = seed & M, (seed - P1) & M
        while i + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12)
             + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h = (rotl(h ^ rnd(0, int.from_bytes(data[i:i + 8], "little")),
                  27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h = (rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * P1
                       & M), 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ (data[i] * P5 & M), 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    return h ^ (h >> 32)


def hash_xxhash64_std(c: Column) -> Column:
    """`.hash("xxhash64")` with canonical XXH64(seed=0) semantics —
    the value the reference computes.  Arrow-batched kernel (use
    hash_xxhash64 / F.xxhash64 for internal scale keys where only
    stability matters)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def kern(s):
        return s.map(lambda v: None if v is None
                     else str(_xxh64(bytes(v))))

    return kern(c.cast("binary"))


_Z85_ALPHA = ("0123456789abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_REV = {ch: i for i, ch in enumerate(_Z85_ALPHA)}


def encode_z85(c: Column) -> Column:
    """`.encode("z85")` (methods_strings.go:149) — ZeroMQ Z85 spec
    (32/Z85), 4-byte big-endian blocks → 5 chars; misaligned input is
    an error, matching the reference."""
    from pyspark.sql.functions import pandas_udf

    def one(v):
        if v is None:
            return None
        b = bytes(v)
        if len(b) % 4:
            raise ValueError("z85 encode: data length not a "
                             "multiple of 4")
        out = []
        for i in range(0, len(b), 4):
            n = int.from_bytes(b[i:i + 4], "big")
            chunk = []
            for _ in range(5):
                chunk.append(_Z85_ALPHA[n % 85])
                n //= 85
            out.extend(reversed(chunk))
        return "".join(out)

    @pandas_udf("string")
    def kern(s):
        return s.map(one)

    return kern(c.cast("binary"))


def decode_z85(c: Column) -> Column:
    """`.decode("z85")` (methods_strings.go:227)."""
    from pyspark.sql.functions import pandas_udf

    def one(v):
        if v is None:
            return None
        s = str(v)
        if len(s) % 5:
            raise ValueError("z85 decode: length not a multiple of 5")
        out = bytearray()
        for i in range(0, len(s), 5):
            n = 0
            for ch in s[i:i + 5]:
                n = n * 85 + _Z85_REV[ch]
            out += n.to_bytes(4, "big")
        return out.decode("utf-8", "replace")

    @pandas_udf("string")
    def kern(s):
        return s.map(one)

    return kern(c.cast("string"))


def encode_ascii85(c: Column) -> Column:
    """`.encode("ascii85")` (methods_strings.go:89).  No JVM intrinsic
    exists, so this is an Arrow-batched kernel around the stdlib a85
    codec — same z-compressed, unwrapped form as Go's encoding/ascii85."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def enc(s):
        import base64
        return s.map(lambda v: None if v is None
                     else base64.a85encode(bytes(v)).decode("ascii"))

    return enc(c.cast("binary"))


def decode_ascii85(c: Column) -> Column:
    """`.decode("ascii85")` (methods_strings.go:184)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def dec(s):
        import base64
        return s.map(lambda v: None if v is None
                     else base64.a85decode(v).decode("utf-8"))

    return dec(c)


def hash_hmac(c: Column, algorithm: str, key: str) -> Column:
    """`.hash("hmac_sha1"|"hmac_sha256"|"hmac_sha512", key)`
    (methods_strings.go:683) — hex digest like the plain hash methods.
    Arrow-batched stdlib hmac (no JVM intrinsic takes a key)."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    digests = {"hmac_sha1": hashlib.sha1, "hmac_sha256": hashlib.sha256,
               "hmac_sha512": hashlib.sha512, "hmac_md5": hashlib.md5}
    if algorithm not in digests:
        raise ValueError(f"hmac algorithm {algorithm!r} unsupported "
                         f"(have: {sorted(digests)})")
    digestmod = digests[algorithm]
    kb = key.encode("utf-8")

    @pandas_udf("string")
    def mac(s):
        import hmac as _hmac
        return s.map(lambda v: None if v is None
                     else _hmac.new(kb, bytes(v), digestmod).hexdigest())

    return mac(c.cast("binary"))


def parse_json(c: Column, schema: str) -> Column:
    """`.parse_json()` (methods_strings.go:958) with a declared schema —
    the engine is columnar so the parse target is typed; use
    `get_json_object` for ad-hoc single-path extraction instead."""
    return F.from_json(c, schema)


def parse_xml(c: Column, schema: str) -> Column:
    """`.parse_xml()` (methods_strings.go:992) — native from_xml
    (Spark 4); schema-declared like parse_json."""
    return F.from_xml(c, schema)


def parse_csv_line(c: Column, schema: str, sep: str = ",") -> Column:
    """`.parse_csv()` (methods_strings.go:898) for a single line."""
    return F.from_csv(c, schema, {"sep": sep})


def length(c: Column) -> Column:
    """`.length()` on strings (methods_structured.go:712 shares name)."""
    return F.length(c)


def slice_str(c: Column, start: int, end: int) -> Column:
    """`.slice(lo,hi)` on strings (methods_strings go slice semantics)."""
    return F.substring(c, start + 1, end - start)


def strip_html(c: Column) -> Column:
    """`.strip_html()` (methods_strings.go:1983) — tag-removal regex;
    the reference uses a full HTML tokenizer, this covers well-formed
    markup (documented deviation for malformed nesting)."""
    return F.regexp_replace(c, r"<[^>]*>", "")


def filepath_join(parts: Column) -> Column:
    """`.filepath_join()` (methods_strings.go:536)."""
    return F.array_join(parts, "/")


def filepath_split(c: Column) -> Column:
    """`.filepath_split()` (methods_strings.go:569) → [dir, file].
    Go's filepath.Split: dir keeps its trailing separator and is ""
    when the path has none."""
    return F.array(
        F.regexp_extract(c, r"^(.*/)?[^/]*$", 1),
        F.regexp_extract(c, r"([^/]*)$", 1))


def escape_url_query(c: Column) -> Column:
    """`.escape_url_query()` (methods_strings.go:490)."""
    return F.url_encode(c)


def unescape_url_query(c: Column) -> Column:
    """`.unescape_url_query()` (methods_strings.go:513)."""
    return F.url_decode(c)


# ---------------------------------------------------------------- yaml

def yaml_to_json(c: Column) -> Column:
    """`.parse_yaml()` bridge (methods.go parse_yaml): YAML text →
    canonical JSON text, Arrow-batched (no YAML parser exists on the
    JVM side of Spark); pair with from_json(schema) for typed access."""
    import json

    import pandas as pd
    import yaml as _yaml
    from pyspark.sql.functions import pandas_udf

    _ = pd

    @pandas_udf("string")
    def op(vals):
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(json.dumps(_yaml.safe_load(v),
                                      separators=(",", ":"),
                                      sort_keys=True, ensure_ascii=False))
            except _yaml.YAMLError:
                out.append(None)
        return pd.Series(out)

    return op(c)


def json_to_yaml(c: Column) -> Column:
    """`.format_yaml()` (methods.go format_yaml): JSON text → YAML."""
    import json

    import pandas as pd
    import yaml as _yaml
    from pyspark.sql.functions import pandas_udf

    _ = pd

    @pandas_udf("string")
    def op(vals):
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(_yaml.safe_dump(json.loads(v),
                                           default_flow_style=False,
                                           sort_keys=True,
                                           allow_unicode=True))
            except (json.JSONDecodeError, _yaml.YAMLError):
                out.append(None)
        return pd.Series(out)

    return op(c)


def aes_stream_mode(name: str, scheme: str, target: Column,
                    key: Column, iv: Column) -> Column:
    """AES-CTR / AES-OFB for encrypt_aes/decrypt_aes
    (methods_strings.go:300,352): the reference's stream-cipher modes
    have no Spark builtin, so they run as an Arrow-batched kernel over
    the `cryptography` package (plan-time gated)."""
    try:
        import cryptography  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ValueError(
            f"{name} scheme {scheme!r} needs the 'cryptography' "
            "package (pip install cryptography)") from e
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    enc = name == "encrypt_aes"

    @pandas_udf("binary")
    def kern(vals: pd.Series, keys: pd.Series,
             ivs: pd.Series) -> pd.Series:
        from cryptography.hazmat.primitives.ciphers import (Cipher,
                                                            algorithms,
                                                            modes)
        out = []
        for v, k, i in zip(vals, keys, ivs):
            if v is None or k is None or i is None:
                out.append(None)
                continue
            if scheme == "cbc":
                # reference (crypto/cipher CBC): raw blocks, caller
                # supplies aligned input; no IV prefix, no padding
                if len(bytes(v)) % 16:
                    raise ValueError(
                        "plaintext is not a multiple of the block "
                        "size" if enc else
                        "ciphertext is not a multiple of the block "
                        "size")
                mode = modes.CBC(bytes(i))
            elif scheme == "ctr":
                mode = modes.CTR(bytes(i))
            else:
                mode = modes.OFB(bytes(i))
            op_ctx = Cipher(algorithms.AES(bytes(k)), mode)
            op = op_ctx.encryptor() if enc else op_ctx.decryptor()
            out.append(op.update(bytes(v)) + op.finalize())
        return pd.Series(out)

    res = kern(target.cast("binary"), key.cast("binary"),
               iv.cast("binary"))
    return res if enc else res.cast("string")
