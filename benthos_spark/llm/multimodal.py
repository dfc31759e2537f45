"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode kernels are REAL where the stdlib reaches: WAV audio decodes
through `wave` (rate/samples/PCM stats), PNG/BMP/JPEG headers parse
to true pixel dimensions via `struct`, and GIF containers block-walk
to true per-frame geometry (`_gif_info`).  Payloads in formats the
container can't decode (no PIL/ffmpeg) fall back to a deterministic
fake (clearly marked) so pipelines stay testable end-to-end; a full
decoder drops into `_decode_image_batch` unchanged.  The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas partitioning — is
identical either way.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "width int, height int, features array<float>")


def _image_dims(b: bytes) -> tuple[int, int] | None:
    """True pixel dimensions from PNG / BMP / JPEG headers (pure
    struct parsing, no image library needed)."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])  # IHDR
        return w, h
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])  # BITMAPINFOHEADER
        return w, abs(h)
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG: scan for SOFn
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return w, h
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def _decode_image_batch(payload_bytes: bytes | None) -> tuple[int, int, list[float]]:
    """Image decode: REAL header parse for PNG/BMP/JPEG (true width ×
    height); other formats fall back to a deterministic fake (dims from
    byte length) since no pixel decoder ships in this container —
    replace this fallback with PIL/torchvision, the signature and batch
    shape stay the same.  The 8 features are byte-statistics either
    way (a real embedding needs a model, out of scope)."""
    if payload_bytes is None:
        return 0, 0, [0.0] * 8
    n = len(payload_bytes)
    dims = _image_dims(payload_bytes)
    if dims is None:  # deterministic FAKE dims for undecodable bytes
        dims = ((n % 640) + 1, (n % 480) + 1)
    head = payload_bytes[:64]
    features = [float(sum(head[i::8]) % 256) / 255.0 for i in range(8)]
    return dims[0], dims[1], features


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas: executors stream Arrow
    batches of binary payloads through the (stubbed) decode kernel.
    Partition-parallel, constant memory per batch — payloads never
    concentrate on the driver."""
    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [_decode_image_batch(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "features": [d[2] for d in decoded],
            })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def _decode_audio_batch(payload_bytes: bytes | None) -> tuple[int, int, list[float]]:
    """Audio decode: REAL for WAV payloads — stdlib `wave` reads the
    true sample rate and frame count, and the features are genuine PCM
    statistics (mean |amplitude|, RMS, peak, zero-crossing rate over
    the first 16k samples, each scaled to [0,1]).  Non-WAV payloads
    fall back to a deterministic fake from byte stats (no mp3/ogg
    codecs in this container; swap in soundfile/librosa — the batch
    shape is identical)."""
    if payload_bytes is None:
        return 0, 0, [0.0] * 4
    if payload_bytes[:4] == b"RIFF" and payload_bytes[8:12] == b"WAVE":
        import io
        import wave
        try:
            with wave.open(io.BytesIO(payload_bytes)) as w:
                rate, nframes = w.getframerate(), w.getnframes()
                width, nch = w.getsampwidth(), w.getnchannels()
                raw = w.readframes(min(nframes, 16384))
            if width == 2:
                samples = struct.unpack(f"<{len(raw) // 2}h", raw)
            else:  # 8-bit unsigned PCM
                samples = [b - 128 for b in raw]
            full = float(2 ** (8 * width - 1))
            if samples:
                mean_abs = sum(abs(s) for s in samples) / len(samples) / full
                rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / full
                peak = max(abs(s) for s in samples) / full
                zc = sum(1 for a, b in zip(samples, samples[1:])
                         if (a < 0) != (b < 0)) / max(len(samples) - 1, 1)
                feats = [mean_abs, rms, peak, zc]
            else:
                feats = [0.0] * 4
            return rate, nframes * nch, feats
        except (wave.Error, struct.error):
            pass  # malformed RIFF: fall through to the fake
    n = len(payload_bytes)
    rate = 16000 if n % 2 == 0 else 44100
    feats = [float(sum(payload_bytes[i::4]) % 101) / 100.0 for i in range(4)]
    return rate, n * 4, feats


def _gif_info(b: bytes) -> tuple[int, int, list[tuple[int, int, int, int]]] | None:
    """REAL GIF container walk (struct-level, per the GIF89a spec):
    logical screen dims from the header, then one (x, y, w, h) per
    image descriptor, skipping extensions, color tables, and LZW data
    sub-blocks without decompressing them.  Returns None for non-GIF
    or malformed payloads."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    i = 13
    if packed & 0x80:                       # global color table
        i += 3 * (2 << (packed & 7))
    frames: list[tuple[int, int, int, int]] = []
    try:
        while i < len(b):
            t = b[i]
            if t == 0x3B:                   # trailer
                break
            if t == 0x21:                   # extension: label + sub-blocks
                i += 2
                while b[i] != 0:
                    i += 1 + b[i]
                i += 1
            elif t == 0x2C:                 # image descriptor
                x, y, fw, fh = struct.unpack("<HHHH", b[i + 1:i + 9])
                p = b[i + 9]
                i += 10
                if p & 0x80:                # local color table
                    i += 3 * (2 << (p & 7))
                i += 1                      # LZW min code size
                while b[i] != 0:            # data sub-blocks
                    i += 1 + b[i]
                i += 1
                frames.append((x, y, fw, fh))
            else:                           # unknown block: stop the walk
                break
    except IndexError:
        return None                         # truncated payload
    return w, h, frames


def _sample_video_frames(payload_bytes: bytes | None,
                         every_n: int = 30) -> list[list[float]]:
    """Frame sampler.  REAL for GIF payloads: the container block walk
    (`_gif_info`) yields every image descriptor; sampling takes every
    `every_n`-th frame and emits its true (w, h, x, y) as the 4-float
    feature (pixel features need an LZW decode + palette, out of
    scope — the geometry is decoded, not fabricated).  Non-GIF
    containers (mp4/webm need ffmpeg, absent here) fall back to a
    deterministic fake; swap in ffmpeg/decord — the mapInPandas batch
    shape and output schema stay identical."""
    if payload_bytes is None:
        return []
    info = _gif_info(payload_bytes)
    if info is not None:
        _, _, frames = info
        return [[float(fw), float(fh), float(x), float(y)]
                for (x, y, fw, fh) in frames[::max(every_n, 1)]]
    # deterministic FAKE for undecodable containers
    n_frames = max(1, len(payload_bytes) // 16)
    out = []
    for f in range(0, n_frames, every_n):
        chunk = payload_bytes[f * 16:(f + 1) * 16] or payload_bytes[:16]
        out.append([float(b % 64) / 64.0 for b in chunk[:4]])
    return out


AUDIO_SCHEMA = ("media_id long, sample_rate int, n_samples long, "
                "features array<float>")
FRAMES_SCHEMA = "media_id long, frame_no int, frame_features array<float>"


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio path of the multimodal pipeline (same plumbing as
    extract_features; stubbed kernel)."""
    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [_decode_audio_batch(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": [d[0] for d in decoded],
                "n_samples": [d[1] for d in decoded],
                "features": [d[2] for d in decoded],
            })

    return media.mapInPandas(op, schema=AUDIO_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling: one output row per sampled frame (explode inside
    the pandas batch — rows fan out without driver involvement)."""
    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, frame_nos, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, frame in enumerate(
                        _sample_video_frames(payload, every_n)):
                    ids.append(mid)
                    frame_nos.append(i)
                    feats.append(frame)
            yield pd.DataFrame({"media_id": ids, "frame_no": frame_nos,
                                "frame_features": feats})

    return media.mapInPandas(op, schema=FRAMES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """`resize` kernel placeholder: passes payload through with target
    dims recorded in meta (a real implementation re-encodes bytes in
    the same mapInPandas shape)."""
    return media.withColumn(
        "meta", F.map_concat(
            F.map_filter(F.col("meta"),
                         lambda k, _: ~k.isin(["resize_w", "resize_h"])),
            F.create_map(F.lit("resize_w"), F.lit(str(width)),
                         F.lit("resize_h"), F.lit(str(height)))))


def wav_bytes(rate: int = 16000, n_frames: int = 256,
              freq: float = 440.0) -> bytes:
    """A real 16-bit mono PCM WAV payload (sine wave) — deterministic,
    stdlib-only; used to exercise the REAL audio decode path."""
    import io
    import math
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(20000 * math.sin(2 * math.pi * freq
                                                   * i / rate)))
            for i in range(n_frames))
        w.writeframes(frames)
    return buf.getvalue()


def bmp_bytes(width: int, height: int) -> bytes:
    """A real (minimal, uncompressed 24-bit) BMP payload —
    deterministic pixel bytes; exercises the REAL image header
    parse."""
    row = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    pixels = bytes((x * 7 + y * 13) % 256
                   for y in range(height) for x in range(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return header + pixels


def gif_bytes(width: int, height: int, n_frames: int = 1) -> bytes:
    """A real multi-frame GIF89a payload: 4-color global palette,
    uncompressed-trick LZW (a CLEAR code before every pixel keeps the
    code width fixed at 3 bits — valid per the spec, decodable by any
    GIF reader), one full-size image descriptor per frame.
    Deterministic; exercises the REAL container walk."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x91, 0, 0])              # GCT, 4 colors
    out += bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 255, 255])
    for f in range(n_frames):
        out += bytes([0x21, 0xF9, 0x04, 0x00])      # graphic control ext
        out += struct.pack("<H", 10 * (f + 1))      # frame delay
        out += bytes([0x00, 0x00])                  # transparent, term
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += b"\x00"                              # no local color table
        # LZW min code size 2 → 3-bit codes, clear=4, end=5
        codes: list[int] = []
        for p in range(width * height):
            codes += [4, (p + f) % 4]
        codes += [5]
        acc = nbits = 0
        data = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += 3
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            data.append(acc & 0xFF)
        out += bytes([2])                            # min code size
        for j in range(0, len(data), 255):           # data sub-blocks
            chunk = data[j:j + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"                               # block terminator
    out += b"\x3b"                                   # trailer
    return bytes(out)


def real_media_table(spark, n: int = 32) -> DataFrame:
    """Synthetic media rows with REAL payloads: id%3==0 are WAV sine
    waves (rate varies per row), id%3==1 are BMP images (dims vary per
    row), id%3==2 are multi-frame GIFs (dims + frame count vary) —
    every value the decode kernels emit is checkable against the
    generator's parameters."""
    rows = []
    for i in range(n):
        if i % 3 == 0:
            rows.append((i, "audio", wav_bytes(
                rate=8000 + 4000 * ((i // 3) % 3), n_frames=100 + i),
                "audio/wav", {"source": "synthetic"}))
        elif i % 3 == 1:
            rows.append((i, "image", bmp_bytes(8 + i, 4 + i), "image/bmp",
                         {"source": "synthetic"}))
        else:
            rows.append((i, "video", gif_bytes(6 + i, 3 + i,
                                               n_frames=2 + (i % 5)),
                         "image/gif", {"source": "synthetic"}))
    # VALUES LocalRelation (X'..' binary literals): createDataFrame's
    # pickled-RDD scan pays a Python worker round-trip per execution
    from benthos_spark.operators.literals import literal_frame
    return literal_frame(
        spark, rows, "media_id long, kind string, payload binary, "
                     "mime string, meta map<string,string>")


def fake_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media rows for tests: payload bytes are a
    function of media_id, so every run (and every engine) agrees."""
    return (spark.range(n)
            .select(F.col("id").alias("media_id"),
                    F.lit("image").alias("kind"),
                    F.encode(F.concat(F.lit("media-payload-"),
                                      F.col("id").cast("string"),
                                      F.repeat(F.lit("x"),
                                               (F.col("id") % 97).cast("int"))),
                             "UTF-8").alias("payload"),
                    F.lit("image/fake").alias("mime"),
                    F.create_map(F.lit("source"),
                                 F.lit("synthetic")).alias("meta")))
