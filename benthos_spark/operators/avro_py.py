"""Pure-Python Avro binary codec — the in-container fallback behind
the `avro` processor (lib/processor/avro.go:22 to_json/from_json).

Spark's native `from_avro`/`to_avro` (spark-avro jar) is the scale
path — JVM, vectorized, schema-registry aware.  That jar isn't in this
container, so this module implements the Avro binary encoding (the
spec's zigzag varints + length-prefixed bytes) in Python, applied as
an Arrow-batched kernel.  Supported schema surface: all primitives,
record, array, map, union, enum, fixed — the datum encoding goavro
uses for the reference's single-message operators (no object-container
framing; files belong to spark.read.format("avro")).
"""

from __future__ import annotations

import json
import struct as _struct
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------- decode

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("avro: truncated payload")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def zigzag(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1)[0] != 0
        if t in ("int", "long"):
            return r.zigzag()
        if t == "float":
            return _struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return _struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read(r.zigzag()).hex()  # JSON-safe
        if t == "string":
            return r.read(r.zigzag()).decode("utf-8")
        raise AvroError(f"avro: unknown type {t!r}")
    if isinstance(schema, list):  # union: branch index then datum
        idx = r.zigzag()
        if not 0 <= idx < len(schema):
            raise AvroError(f"avro: union branch {idx} out of range")
        return _decode(r, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(r, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.zigzag()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                r.zigzag()
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.zigzag()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.zigzag()
            for _ in range(n):
                k = r.read(r.zigzag()).decode("utf-8")
                out[k] = _decode(r, schema["values"])
        return out
    if t == "enum":
        syms = schema["symbols"]
        i = r.zigzag()
        if not 0 <= i < len(syms):
            raise AvroError(f"avro: enum index {i} out of range")
        return syms[i]
    if t == "fixed":
        return r.read(int(schema["size"])).hex()
    return _decode(r, t)  # {"type": "string"} wrapper form


# ---------------------------------------------------------------- encode

def _zigzag_bytes(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    acc &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(v: Any, schema: Any) -> bytes:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return b""
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t in ("int", "long"):
            return _zigzag_bytes(int(v))
        if t == "float":
            return _struct.pack("<f", float(v))
        if t == "double":
            return _struct.pack("<d", float(v))
        if t == "bytes":
            raw = bytes.fromhex(v) if isinstance(v, str) else bytes(v)
            return _zigzag_bytes(len(raw)) + raw
        if t == "string":
            raw = str(v).encode("utf-8")
            return _zigzag_bytes(len(raw)) + raw
        raise AvroError(f"avro: unknown type {t!r}")
    if isinstance(schema, list):
        # Branch resolution by VALUE TYPE (goavro semantics): bool must
        # be tested before int (bool ⊂ int in Python), strings dispatch
        # to string/enum/bytes/fixed, never to a numeric branch.
        def _bname(branch: Any) -> str:
            return branch if isinstance(branch, str) else \
                str(branch.get("type", ""))

        def _fits(branch: Any) -> bool:
            t = _bname(branch)
            if t == "null":
                return v is None
            if v is None:
                return False
            if isinstance(v, bool):
                return t == "boolean"
            if isinstance(v, int):
                return t in ("int", "long")
            if isinstance(v, float):
                return t in ("float", "double")
            if isinstance(v, str):
                return t in ("string", "enum", "bytes", "fixed")
            if isinstance(v, (bytes, bytearray)):
                return t in ("bytes", "fixed", "string")
            if isinstance(v, dict):
                return t in ("record", "map")
            if isinstance(v, (list, tuple)):
                return t == "array"
            return False

        for i, branch in enumerate(schema):
            if _fits(branch):
                return _zigzag_bytes(i) + _encode(v, branch)
        for i, branch in enumerate(schema):  # last resort: trial encode
            if _bname(branch) == "null":
                continue
            try:
                return _zigzag_bytes(i) + _encode(v, branch)
            except Exception:
                continue
        raise AvroError(
            f"avro: no union branch fits value of type "
            f"{type(v).__name__}")
    t = schema["type"]
    if t == "record":
        return b"".join(_encode(v.get(f["name"]), f["type"])
                        for f in schema["fields"])
    if t == "array":
        items = list(v or [])
        out = b""
        if items:
            out += _zigzag_bytes(len(items))
            out += b"".join(_encode(x, schema["items"]) for x in items)
        return out + b"\x00"
    if t == "map":
        entries = dict(v or {})
        out = b""
        if entries:
            out += _zigzag_bytes(len(entries))
            for k, x in entries.items():
                kb = str(k).encode("utf-8")
                out += _zigzag_bytes(len(kb)) + kb + _encode(x, schema["values"])
        return out + b"\x00"
    if t == "enum":
        return _zigzag_bytes(schema["symbols"].index(v))
    if t == "fixed":
        raw = bytes.fromhex(v) if isinstance(v, str) else bytes(v)
        if len(raw) != int(schema["size"]):
            raise AvroError("avro: fixed size mismatch")
        return raw
    return _encode(v, t)


# ---------------------------------------------------------------- columns

def avro_decode_json(col: Column, schema: str | dict) -> Column:
    """binary avro datum → JSON string (`avro` op=to_json).  Arrow-
    batched Python; swap for from_avro+to_json when spark-avro ships."""
    from pyspark.sql.functions import pandas_udf
    sch = json.loads(schema) if isinstance(schema, str) else schema

    @pandas_udf("string")
    def dec(s):
        def one(b):
            if b is None:
                return None
            return json.dumps(_decode(_Reader(bytes(b)), sch),
                              sort_keys=True)
        return s.map(one)

    return dec(col.cast("binary"))


def avro_encode_json(col: Column, schema: str | dict) -> Column:
    """JSON string → binary avro datum (`avro` op=from_json)."""
    from pyspark.sql.functions import pandas_udf
    sch = json.loads(schema) if isinstance(schema, str) else schema

    @pandas_udf("binary")
    def enc(s):
        return s.map(lambda v: None if v is None
                     else _encode(json.loads(v), sch))

    return enc(col)
