"""Jaeger agent exporter: thrift COMPACT-protocol `emitBatch` over UDP.

Clean-room encoder for the public jaeger-idl thrift definitions
(jaegertracing/jaeger-idl `agent.thrift` / `jaeger.thrift`) and the
Apache Thrift compact-protocol spec — the reference's `tracer.jaeger`
ships spans to a jaeger agent on UDP 6831 the same way
(lib/tracer/jaeger.go via jaeger-client-go).  No thrift library is
required: the agent's surface is a single one-way `emitBatch(Batch)`
message, small enough to encode by hand.

Only the encoder and a socket/file transport live here; span dicts come
from metrics.SpanTracer (trace_id/span_id hex strings, µs bounds,
string attributes).
"""

from __future__ import annotations

import socket
import struct

# thrift compact type ids (Thrift compact protocol spec §Struct)
_CT_BOOL_TRUE = 0x01
_CT_BOOL_FALSE = 0x02
_CT_I64 = 0x06
_CT_DOUBLE = 0x07
_CT_BINARY = 0x08
_CT_LIST = 0x09
_CT_STRUCT = 0x0C
_CT_I32 = 0x05


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag64(n: int) -> bytes:
    return _varint(((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF)


def _zigzag32(n: int) -> bytes:
    return _varint(((n << 1) ^ (n >> 31)) & 0xFFFFFFFF)


class _StructWriter:
    """Field-delta encoding for one thrift compact struct."""

    def __init__(self):
        self.buf = bytearray()
        self._last_fid = 0

    def _header(self, fid: int, ctype: int) -> None:
        delta = fid - self._last_fid
        if 0 < delta <= 15:
            self.buf.append((delta << 4) | ctype)
        else:
            self.buf.append(ctype)
            self.buf += _zigzag32(fid) if fid < 0 else _varint(
                ((fid << 1) ^ (fid >> 15)) & 0xFFFF)
        self._last_fid = fid

    def i64(self, fid: int, v: int) -> None:
        self._header(fid, _CT_I64)
        self.buf += _zigzag64(v)

    def i32(self, fid: int, v: int) -> None:
        self._header(fid, _CT_I32)
        self.buf += _zigzag32(v)

    def double(self, fid: int, v: float) -> None:
        self._header(fid, _CT_DOUBLE)
        # compact protocol doubles are 8-byte LITTLE-endian (spec;
        # binary protocol is the big-endian one)
        self.buf += struct.pack("<d", v)

    def boolean(self, fid: int, v: bool) -> None:
        self._header(fid, _CT_BOOL_TRUE if v else _CT_BOOL_FALSE)

    def binary(self, fid: int, v: bytes | str) -> None:
        if isinstance(v, str):
            v = v.encode("utf-8")
        self._header(fid, _CT_BINARY)
        self.buf += _varint(len(v)) + v

    def struct(self, fid: int, payload: bytes) -> None:
        self._header(fid, _CT_STRUCT)
        self.buf += payload

    def list_of(self, fid: int, elem_ctype: int,
                elems: list[bytes]) -> None:
        self._header(fid, _CT_LIST)
        n = len(elems)
        if n < 15:
            self.buf.append((n << 4) | elem_ctype)
        else:
            self.buf.append(0xF0 | elem_ctype)
            self.buf += _varint(n)
        for e in elems:
            self.buf += e

    def done(self) -> bytes:
        return bytes(self.buf) + b"\x00"  # STOP


def _tag(key: str, value: str) -> bytes:
    # jaeger.thrift Tag: 1 key, 2 vType (0 = STRING), 3 vStr
    w = _StructWriter()
    w.binary(1, key)
    w.i32(2, 0)
    w.binary(3, value)
    return w.done()


def _span(span: dict) -> bytes:
    """jaeger.thrift Span from a SpanTracer dict."""
    w = _StructWriter()
    trace = int(span["trace_id"], 16)
    w.i64(1, trace & 0xFFFFFFFFFFFFFFFF)          # traceIdLow
    w.i64(2, (trace >> 64) & 0xFFFFFFFFFFFFFFFF)  # traceIdHigh
    w.i64(3, int(span["span_id"], 16))
    w.i64(4, int(span["parent_span_id"], 16)
          if span.get("parent_span_id") else 0)
    w.binary(5, span["name"])
    # 6: references omitted (parentSpanId carries the parent link)
    w.i32(7, 1)  # flags: sampled
    start = int(span["start_us"])
    w.i64(8, start)
    w.i64(9, max(0, int(span["end_us"]) - start))
    attrs = span.get("attributes") or {}
    if attrs:
        w.list_of(10, _CT_STRUCT,
                  [_tag(k, v) for k, v in sorted(attrs.items())])
    return w.done()


def encode_emit_batch(spans: list[dict], service_name: str,
                      seq_id: int = 0) -> bytes:
    """One UDP datagram: compact-protocol ONEWAY `emitBatch` message
    with Batch{Process{serviceName}, spans} as its single argument."""
    proc = _StructWriter()
    proc.binary(1, service_name)
    batch = _StructWriter()
    batch.struct(1, proc.done())
    batch.list_of(2, _CT_STRUCT, [_span(s) for s in spans])
    args = _StructWriter()
    args.struct(1, batch.done())
    # message header: 0x82, (version 1 | ONEWAY<<5), seqid, name
    name = b"emitBatch"
    head = bytes([0x82, 0x01 | (4 << 5)]) + _varint(seq_id) \
        + _varint(len(name)) + name
    return head + args.done()


class JaegerUdpExporter:
    """Sends emitBatch datagrams to a jaeger agent (default UDP 6831,
    the agent's compact-thrift port).  `transport` is injectable for
    tests: any callable accepting the raw datagram bytes."""

    MAX_PACKET = 65000  # stay under the UDP datagram ceiling

    def __init__(self, service_name: str, host: str = "127.0.0.1",
                 port: int = 6831, transport=None):
        self.service_name = service_name
        self._seq = 0
        if transport is None:
            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            transport = lambda data: sock.sendto(data, (host, port))  # noqa: E731
        self._send = transport

    def emit(self, spans: list[dict]) -> int:
        """Encode + send, chunking so each datagram stays under the
        UDP limit.  Returns the number of datagrams sent."""
        sent = 0
        chunk: list[dict] = []
        size = 0
        for s in spans:
            approx = 64 + len(s.get("name", "")) + sum(
                len(k) + len(v)
                for k, v in (s.get("attributes") or {}).items())
            if chunk and size + approx > self.MAX_PACKET:
                self._flush_chunk(chunk)
                sent += 1
                chunk, size = [], 0
            chunk.append(s)
            size += approx
        if chunk:
            self._flush_chunk(chunk)
            sent += 1
        return sent

    def _flush_chunk(self, chunk: list[dict]) -> None:
        self._send(encode_emit_batch(chunk, self.service_name,
                                     self._seq))
        self._seq += 1
