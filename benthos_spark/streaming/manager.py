"""Streams mode: many named streams in one engine process.

Reference: `benthos streams` (lib/service/run.go:258-287) +
lib/stream/manager/ — named stream CRUD over a REST API.  Here the
manager wraps Spark's StreamingQueryManager: each named stream is a
config built by stream.py whose sink runs as a StreamingQuery (or a
batch job for bounded configs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class StreamHandle:
    name: str
    config: dict
    query: object | None = None       # StreamingQuery for streaming sinks
    result: object | None = None      # DataFrame for batch runs
    extra: dict = field(default_factory=dict)


class StreamManager:
    """Create / read / update / delete named streams
    (lib/stream/manager/type.go CRUD; REST layer out of scope —
    this is the embeddable core the API would call)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._streams: dict[str, StreamHandle] = {}

    def create(self, name: str, config: dict | str) -> StreamHandle:
        from benthos_spark.stream import load_config, run_stream
        if name in self._streams:
            raise ValueError(f"stream {name!r} already exists")
        conf = load_config(config) if isinstance(config, str) else config
        handle = StreamHandle(name, conf)
        out = run_stream(self.spark, conf)
        if out.isStreaming:
            active = {q.name: q for q in self.spark.streams.active}
            handle.query = active.get(name)
        handle.result = out
        self._streams[name] = handle
        return handle

    def read(self, name: str) -> StreamHandle:
        return self._streams[name]

    def list(self) -> dict[str, dict]:
        """name → status summary (the /streams endpoint payload)."""
        out = {}
        for name, h in self._streams.items():
            active = h.query is not None and h.query.isActive
            out[name] = {"active": active, "config": h.config}
        return out

    def update(self, name: str, config: dict | str) -> StreamHandle:
        self.delete(name)
        return self.create(name, config)

    def delete(self, name: str) -> None:
        h = self._streams.pop(name)
        if h.query is not None and h.query.isActive:
            h.query.stop()

    def stop_all(self) -> None:
        for name in list(self._streams):
            self.delete(name)
