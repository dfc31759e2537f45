"""Pure-Python raw-snappy codec (the block format, not the framing
format) — un-gates the `snappy` compress/decompress algorithm
in-container, mirroring how avro_py/protobuf_py un-gate their
processors.

Format per google/snappy format_description.txt (public spec):
  - preamble: uncompressed length as little-endian varint;
  - elements: 2-bit tag in the low bits of the first byte —
      00 literal (len-1 in the upper 6 bits; 60..63 = 1/2/3/4
         extra length bytes, little-endian),
      01 copy, 1-byte offset (len-4 in bits 2-4, offset 11 bits),
      10 copy, 2-byte little-endian offset (len-1 in upper 6 bits),
      11 copy, 4-byte little-endian offset.
Copies may overlap forward (offset < length ⇒ repeating pattern),
like LZ77.

The encoder emits all-literal output — valid snappy any decoder
accepts (compression ratio 1.0; the C extension drops in for real
ratios, this codec is for parity and for DECODING real payloads).
The decoder handles arbitrary real snappy streams.
"""

from __future__ import annotations


class SnappyError(ValueError):
    pass


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if i >= len(b):
            raise SnappyError("snappy: truncated varint preamble")
        byte = b[i]
        out |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            return out, i
        shift += 7
        if shift > 35:
            raise SnappyError("snappy: varint overflow")


def compress(data: bytes) -> bytes:
    """All-literal snappy encoding (valid per spec; ratio 1.0)."""
    data = bytes(data)
    n = len(data)
    # varint preamble
    out = bytearray()
    v = n
    while True:
        if v < 0x80:
            out.append(v)
            break
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    i = 0
    while i < n:
        chunk = data[i:i + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < (1 << 8):
            out.append(60 << 2)
            out.append(ln)
        else:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        out += chunk
        i += len(chunk)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    data = bytes(data)
    n, i = _read_varint(data, 0)
    out = bytearray()
    ln = len(data)
    while i < ln:
        tag = data[i]
        kind = tag & 3
        if kind == 0:                       # literal
            length = tag >> 2
            i += 1
            if length >= 60:
                extra = length - 59
                if i + extra > ln:
                    raise SnappyError("snappy: truncated literal length")
                length = int.from_bytes(data[i:i + extra], "little")
                i += extra
            length += 1
            if i + length > ln:
                raise SnappyError("snappy: truncated literal")
            out += data[i:i + length]
            i += length
            continue
        if kind == 1:                       # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            if i + 2 > ln:
                raise SnappyError("snappy: truncated copy-1")
            offset = ((tag >> 5) << 8) | data[i + 1]
            i += 2
        elif kind == 2:                     # copy, 2-byte offset
            length = (tag >> 2) + 1
            if i + 3 > ln:
                raise SnappyError("snappy: truncated copy-2")
            offset = int.from_bytes(data[i + 1:i + 3], "little")
            i += 3
        else:                               # copy, 4-byte offset
            length = (tag >> 2) + 1
            if i + 5 > ln:
                raise SnappyError("snappy: truncated copy-4")
            offset = int.from_bytes(data[i + 1:i + 5], "little")
            i += 5
        if offset == 0 or offset > len(out):
            raise SnappyError("snappy: copy offset out of range")
        start = len(out) - offset
        for j in range(length):             # may overlap forward
            out.append(out[start + j])
    if len(out) != n:
        raise SnappyError(
            f"snappy: length mismatch (preamble {n}, got {len(out)})")
    return bytes(out)
