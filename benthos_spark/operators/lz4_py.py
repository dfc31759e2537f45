"""Pure-Python LZ4 codec (frame format + block format + xxHash32).

Reference: lib/processor/compress.go / decompress.go:26 list "lz4"
among the supported algorithms (via the public pierrec/lz4 Go
package).  This container ships neither the lz4 CLI nor the python-lz4
binding, so — same doctrine as operators/snappy_py.py — the algorithm
is implemented from the PUBLIC specs:

- LZ4 Block Format spec  (github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md)
- LZ4 Frame Format spec v1.6.1 (…/lz4_Frame_format.md)
- xxHash32 spec          (github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md)

The decoder is spec-complete for the frame features that appear in
practice (block checksums, content size, content checksum, dictionary
ID parsing; linked-block frames are decoded too since the plain block
decoder naturally sees the concatenated output window).  The encoder
emits independent blocks with a greedy hash-table matcher (the classic
LZ4 fast level) and a content checksum — interoperable with any
standard lz4 tool, and the C binding drops in transparently for
ratio/speed when available (operators/codec.py prefers it).

Compression runs inside Arrow-batched pandas UDFs (operators/codec.py)
— per-value Python work, the documented slow path; at 100 TB prefer
parquet's native codecs for storage and keep lz4 for payload parity.
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_P1, _P2, _P3, _P4, _P5 = (2654435761, 2246822519, 3266489917,
                           668265263, 374761393)
_M32 = 0xFFFFFFFF

_MIN_MATCH = 4
# spec: the last 5 bytes are always literals; matches must not start
# within the last 12 bytes
_MFLIMIT = 12
_LAST_LITERALS = 5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (spec §XXH32 algorithm description)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while i <= limit:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = struct.unpack_from("<I", data, i + 4 * j)[0]
                v = (v + lane * _P2) & _M32
                v = _rotl(v, 13)
                v = (v * _P1) & _M32
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (h + struct.unpack_from("<I", data, i)[0] * _P3) & _M32
        h = (_rotl(h, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M32
        h = (_rotl(h, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


class Lz4Error(ValueError):
    pass


# ------------------------------------------------------------- block

def compress_block(src: bytes) -> bytes:
    """LZ4 block compress — greedy single-probe hash table (the
    reference fast level).  Always produces valid block-format output;
    callers fall back to a stored block when this doesn't shrink."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - _MFLIMIT
    while i <= limit:
        seq = src[i:i + 4]
        key = struct.unpack("<I", seq)[0]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF or src[cand:cand + 4] != seq:
            i += 1
            continue
        # extend the match forward (not past the 5-byte literal tail)
        m = i + 4
        c = cand + 4
        end = n - _LAST_LITERALS
        while m < end and src[m] == src[c]:
            m += 1
            c += 1
        lit_len = i - anchor
        match_len = m - i - _MIN_MATCH
        token_lit = 15 if lit_len >= 15 else lit_len
        token_mat = 15 if match_len >= 15 else match_len
        out.append((token_lit << 4) | token_mat)
        if lit_len >= 15:
            rest = lit_len - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out += src[anchor:i]
        out += struct.pack("<H", i - cand)
        if match_len >= 15:
            rest = match_len - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        anchor = m
        i = m
    # trailing literals
    lit_len = n - anchor
    token_lit = 15 if lit_len >= 15 else lit_len
    out.append(token_lit << 4)
    if lit_len >= 15:
        rest = lit_len - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += src[anchor:]
    return bytes(out)


def decompress_block(src: bytes, max_size: int = 1 << 30,
                     prefix: bytes = b"") -> bytes:
    """LZ4 block decompress (block-format spec sequence walk).
    `prefix` supplies the back-reference window for linked blocks."""
    out = bytearray(prefix)
    base = len(prefix)
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise Lz4Error("literal run past end of block")
        out += src[i:i + lit_len]
        i += lit_len
        if len(out) - base > max_size:
            raise Lz4Error("decompressed size exceeds limit")
        if i == n:
            break  # last sequence has no match part
        if i + 2 > n:
            raise Lz4Error("truncated match offset")
        offset = struct.unpack_from("<H", src, i)[0]
        i += 2
        if offset == 0 or offset > len(out):
            raise Lz4Error(f"invalid match offset {offset}")
        match_len = (token & 0xF)
        if match_len == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += _MIN_MATCH
        # overlapping copy byte-at-a-time semantics
        pos = len(out) - offset
        for _ in range(match_len):
            out.append(out[pos])
            pos += 1
        if len(out) - base > max_size:
            raise Lz4Error("decompressed size exceeds limit")
    return bytes(out[base:])


# ------------------------------------------------------------- frame

_BLOCK_MAX = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def compress(data: bytes, block_max_code: int = 4,
             content_checksum: bool = True) -> bytes:
    """LZ4 frame compress: independent blocks, optional content
    checksum, stored blocks when compression doesn't shrink."""
    if block_max_code not in _BLOCK_MAX:
        raise Lz4Error(f"block max size code {block_max_code} invalid")
    out = bytearray(struct.pack("<I", _MAGIC))
    flg = (1 << 6) | (1 << 5)  # version 01, block-independent
    if content_checksum:
        flg |= 1 << 2
    bd = block_max_code << 4
    desc = bytes([flg, bd])
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    bmax = _BLOCK_MAX[block_max_code]
    for off in range(0, len(data), bmax) or [0]:
        chunk = data[off:off + bmax]
        if not chunk:
            break
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:  # stored block: high bit flags uncompressed
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decompress(data: bytes, max_size: int = 1 << 30) -> bytes:
    """LZ4 frame decompress with checksum verification."""
    if len(data) < 7:
        raise Lz4Error("frame too short")
    magic, = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise Lz4Error(f"bad magic 0x{magic:08x}")
    flg = data[4]
    bd = data[5]
    if (flg >> 6) != 1:
        raise Lz4Error(f"unsupported frame version {flg >> 6}")
    block_indep = bool(flg & (1 << 5))
    block_checksum = bool(flg & (1 << 4))
    has_content_size = bool(flg & (1 << 3))
    has_content_checksum = bool(flg & (1 << 2))
    has_dict_id = bool(flg & 1)
    bmax_code = (bd >> 4) & 0x7
    if bmax_code not in _BLOCK_MAX:
        raise Lz4Error(f"block max size code {bmax_code} invalid")
    i = 6
    content_size = None
    if has_content_size:
        content_size, = struct.unpack_from("<Q", data, i)
        i += 8
    if has_dict_id:
        i += 4  # parsed, external dictionaries unsupported below
    hc = data[i]
    i += 1
    if ((xxh32(data[4:i - 1]) >> 8) & 0xFF) != hc:
        raise Lz4Error("frame descriptor checksum mismatch")
    out = bytearray()
    while True:
        if i + 4 > len(data):
            raise Lz4Error("missing EndMark")
        size, = struct.unpack_from("<I", data, i)
        i += 4
        if size == 0:
            break
        uncompressed = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        if i + size > len(data):
            raise Lz4Error("block past end of frame")
        block = data[i:i + size]
        i += size
        if block_checksum:
            bc, = struct.unpack_from("<I", data, i)
            i += 4
            if xxh32(block) != bc:
                raise Lz4Error("block checksum mismatch")
        if uncompressed:
            out += block
        else:
            window = b"" if block_indep else bytes(out[-0xFFFF:])
            out += decompress_block(block, max_size=max_size,
                                    prefix=window)
        if len(out) > max_size:
            raise Lz4Error("decompressed size exceeds limit")
    if has_content_checksum:
        if i + 4 > len(data):
            raise Lz4Error("missing content checksum")
        cc, = struct.unpack_from("<I", data, i)
        if xxh32(bytes(out)) != cc:
            raise Lz4Error("content checksum mismatch")
    if content_size is not None and content_size != len(out):
        raise Lz4Error(
            f"content size {content_size} != decoded {len(out)}")
    return bytes(out)
