"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Decode support is format-tiered:

* **Real decoders** (numpy-only, no codec library needed): binary
  PGM/PPM images (netpbm P5/P6) and RIFF/WAVE PCM-16 audio — parsed
  byte-for-byte by ``decode_pgm_ppm`` / ``decode_wav``, exercised
  end-to-end by ``extract_media_metadata`` (mapInPandas) and checked
  against a DuckDB oracle that recomputes the expected pixel/sample
  statistics arithmetically (__spark_entry__ ``media_meta``).
* **Codec formats** (JPEG/PNG/MP3/H.264 …) require libraries absent
  from this container, so ``decode_image``/``decode_audio`` raise
  NotImplementedError for them — clearly marked stubs; ``fake=True``
  switches in a deterministic stand-in for tests.

The Spark-side plumbing is identical for both tiers: schemas, Arrow
batch shapes, ``mapInPandas`` signatures, partition sizing.  At 100 TB
the binary column dominates I/O, so every helper keeps column pruning
intact (metadata-only paths never touch the payload column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image|audio|video
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("payload", BinaryType(), True),      # opaque bytes
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
    StructField("n_bytes", IntegerType(), False),
])


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload = repeatable byte pattern
    keyed by media_id (pure column expressions)."""
    kinds = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                 F.lit("video")),
                         (F.col("id") % 3 + 1).cast("int"))
    payload = F.encode(
        F.concat(F.lit("payload-"), F.col("id").cast("string"),
                 F.lit("-"), F.repeat(F.lit("x"),
                                      (F.col("id") % 64 + 16).cast("int"))),
        "utf-8")
    return spark.range(n).select(
        F.col("id").alias("media_id"), kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        ((F.col("id") % 8 + 1) * 64).cast("int").alias("width"),
        ((F.col("id") % 4 + 1) * 64).cast("int").alias("height"),
        (F.col("id") * 100).cast("int").alias("duration_ms"),
        payload.alias("payload"))


# ---------------------------------------------------------------------------
# real decoders: netpbm (PGM P5 / PPM P6) and RIFF/WAVE PCM-16 — pure
# numpy/bytes, no codec libraries
# ---------------------------------------------------------------------------

def encode_pgm(width: int, height: int, pixels) -> bytes:
    """Binary PGM (P5, maxval 255) from a flat iterable of 0-255 ints."""
    import numpy as np
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.size != width * height:
        raise ValueError(f"{arr.size} pixels != {width}x{height}")
    return (f"P5\n{width} {height}\n255\n".encode("ascii")
            + arr.tobytes())


def encode_ppm(width: int, height: int, rgb) -> bytes:
    """Binary PPM (P6, maxval 255) from a flat iterable of RGB bytes."""
    import numpy as np
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.size != width * height * 3:
        raise ValueError(f"{arr.size} bytes != {width}x{height}x3")
    return (f"P6\n{width} {height}\n255\n".encode("ascii")
            + arr.tobytes())


def decode_pgm_ppm(payload: bytes):
    """Parse binary netpbm: returns (width, height, ndarray) — shape
    (h, w) for P5, (h, w, 3) for P6.  Handles '#' comments and arbitrary
    whitespace in the header, per the netpbm spec."""
    import numpy as np
    buf = bytes(payload)
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    channels = 1 if buf[:2] == b"P5" else 3
    # tokenize the header: magic, width, height, maxval — comments run
    # '#' to end-of-line; a single whitespace byte follows maxval
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    n = width * height * channels
    arr = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    shape = (height, width) if channels == 1 else (height, width, 3)
    return width, height, arr.reshape(shape)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE, PCM 16-bit mono, little-endian."""
    import struct
    import numpy as np
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes):
    """Parse RIFF/WAVE PCM-16: returns (sample_rate, int16 ndarray,
    n_channels).  Walks the chunk list properly (fmt /data may be
    preceded by LIST etc.), mono or interleaved multi-channel (samples
    returned flat/interleaved; divide by n_channels for frame counts —
    duration is frames/rate, NOT samples/rate)."""
    import struct
    import numpy as np
    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, data, n_ch = 12, None, None, None, 1
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM-16 WAV is decoded without codec libraries")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2"), n_ch


def decode_image(payload: bytes):
    """Decode an image payload.  Binary PGM/PPM decodes for real (numpy
    header+raster parse); codec formats (JPEG/PNG/…) would need a codec
    library not present in this environment — those raise, clearly
    marked."""
    head = bytes(payload[:2])
    if head in (b"P5", b"P6"):
        return decode_pgm_ppm(payload)[2]
    raise NotImplementedError(
        "codec image formats (JPEG/PNG/...) require PIL/opencv; "
        "not available in this container — PGM/PPM decode natively")


def decode_audio(payload: bytes):
    """Decode an audio payload.  RIFF/WAVE PCM-16 decodes for real;
    codec formats (MP3/AAC/…) raise — clearly marked stub tier."""
    if bytes(payload[:4]) == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "codec audio formats (MP3/AAC/...) require a codec library; "
        "not available in this container — WAV PCM-16 decodes natively")


def _fake_feature(payload: bytes, dim: int = 8):
    """Deterministic stand-in for a decoded-media feature vector: byte
    histogram folded to `dim` buckets, L1-normalized."""
    import numpy as np
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    total = hist.sum()
    return [float(x) for x in (hist / total if total else hist)]


def extract_features(media: DataFrame, dim: int = 8,
                     fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over media batches.  The batch shape
    (iterator of pdf with binary column) and output schema are the real
    production plumbing; only the per-payload kernel is stubbed/faked."""
    def _batches(pdf_iter):
        import pandas as pd
        for pdf in pdf_iter:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                raw = b"" if payload is None else bytes(payload)
                nbytes.append(len(raw))
                if fake:
                    feats.append(_fake_feature(raw, dim))
                else:
                    feats.append(decode_image(raw))  # pragma: no cover
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": nbytes,
            })

    from versa_spark.shipping import ensure_shipped
    ensure_shipped(media.sparkSession)
    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: (media_id, frame_ts_ms) rows —
    pure expressions (sequence + explode); the decode of each frame is the
    stubbed kernel.  Metadata-only: never reads the payload column."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


METADATA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_samples", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("mean_value", DoubleType(), True),
])


def synthetic_codec_media(spark, sf_dir: str, limit: int = 200) -> DataFrame:
    """Deterministic REAL-format media derived from the documents table
    (so a SQL oracle can recompute the expected statistics from doc_id
    alone): even doc_ids become binary PGM images, odd ones WAV PCM-16
    audio.

        image: w = id%8+2, h = id%4+2, pixel[i] = (id*7 + i) % 256
        audio: n = id%32+8, rate = 1000 Hz,
               sample[i] = (id*131 + i*17) % 2003 - 1001

    The payloads are genuine format bytes (encode_pgm / encode_wav), so
    decoding them back is a true round-trip test of the parsers, not an
    identity."""
    import pandas as pd

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id").orderBy("doc_id").limit(limit))

    def _gen(pdf_iter):
        import numpy as np
        for pdf in pdf_iter:
            rows = []
            for mid in pdf["doc_id"].astype("int64"):
                mid = int(mid)
                if mid % 2 == 0:
                    w, h = mid % 8 + 2, mid % 4 + 2
                    px = (mid * 7 + np.arange(w * h)) % 256
                    rows.append((mid, "image", "image/x-portable-graymap",
                                 encode_pgm(w, h, px)))
                else:
                    n = mid % 32 + 8
                    s = (mid * 131 + 17 * np.arange(n)) % 2003 - 1001
                    rows.append((mid, "audio", "audio/wav",
                                 encode_wav(s, sample_rate=1000)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "mime",
                                              "payload"])

    from versa_spark.shipping import ensure_shipped
    ensure_shipped(spark)
    return docs.mapInPandas(
        _gen, "media_id long, kind string, mime string, payload binary")


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction through the REAL decoders:
    payload bytes → (width, height, mean pixel) for netpbm images,
    (n_samples, duration_ms, mean |sample|) for WAV audio.  One Arrow
    batch per partition slice; the decode kernel is pure numpy."""
    def _batches(pdf_iter):
        import numpy as np
        import pandas as pd
        for pdf in pdf_iter:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                raw = b"" if payload is None else bytes(payload)
                # dispatch through decode_image/decode_audio so codec
                # payloads (PNG/MP3/…) and unsupported kinds raise the
                # documented NotImplementedError, never a misleading
                # wrong-format ValueError from the wrong parser
                if kind == "image":
                    arr = decode_image(raw)
                    h, w = arr.shape[:2]
                    out.append((int(mid), kind, w, h, None, None,
                                round(float(arr.mean()), 6)))
                elif kind == "audio":
                    rate, samples, n_ch = decode_audio(raw)
                    # n_samples = frames (per-channel), so stereo input
                    # does not double the reported duration
                    n = int(samples.size) // n_ch
                    out.append((int(mid), kind, None, None, n,
                                int(round(n * 1000 / rate)),
                                round(float(np.abs(
                                    samples.astype(np.int64)).mean()), 6)))
                else:
                    raise NotImplementedError(
                        f"metadata extraction for kind={kind!r} needs a "
                        "codec library not present in this container "
                        "(images: PGM/PPM native; audio: WAV PCM-16 "
                        "native)")
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "width", "height", "n_samples",
                "duration_ms", "mean_value"])

    import pandas as pd  # noqa: F401  (closure import for workers)
    from versa_spark.shipping import ensure_shipped
    ensure_shipped(media.sparkSession)
    return media.mapInPandas(_batches, METADATA_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata rollup (column pruning: payload never scanned)."""
    return (media.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.avg("width").alias("avg_width"),
                 F.avg("duration_ms").alias("avg_duration_ms")))


RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("payload", BinaryType(), False),
    StructField("mean_value", DoubleType(), False),
])


def resize_images(media: DataFrame, new_w: int = 2,
                  new_h: int = 2) -> DataFrame:
    """REAL nearest-neighbor resize for netpbm payloads (numpy-only):
    decode → integer index map → re-encode.  The sampling convention is
    floor scaling, src = (dst · src_dim) // dst_dim — fully arithmetic,
    so a SQL oracle recomputes the resized pixel statistics from the
    synthetic generator formula without decoding anything.

    mapInPandas, one Arrow batch per partition slice; the payload is
    decoded and re-encoded inside the worker (bytes never round-trip
    through the driver).  Codec formats (JPEG/PNG) raise the documented
    NotImplementedError via decode_image.  At 100 TB the payload column
    dominates — resize is the classic payload-shrinking projection, so
    running it EARLY in a media pipeline cuts every downstream shuffle
    by the area ratio."""
    def _batches(pdf_iter):
        import numpy as np
        import pandas as pd
        for pdf in pdf_iter:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload))
                h, w = arr.shape[:2]
                ys = (np.arange(new_h) * h) // new_h
                xs = (np.arange(new_w) * w) // new_w
                small = arr[ys][:, xs]
                if small.ndim == 2:
                    payload2 = encode_pgm(new_w, new_h, small.ravel())
                else:
                    payload2 = encode_ppm(new_w, new_h, small.ravel())
                out.append((int(mid), new_w, new_h, payload2,
                            round(float(small.astype(np.float64).mean()),
                                  6)))
            yield pd.DataFrame(out, columns=[
                "media_id", "width", "height", "payload", "mean_value"])

    import pandas as pd  # noqa: F401
    from versa_spark.shipping import ensure_shipped
    ensure_shipped(media.sparkSession)
    return media.mapInPandas(_batches, RESIZE_SCHEMA)


RESAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_samples", IntegerType(), False),
    StructField("sample_rate", IntegerType(), False),
    StructField("payload", BinaryType(), False),
    StructField("mean_abs", DoubleType(), False),
])


def resample_audio(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio decimation for WAV PCM-16 payloads: keep every
    *factor*-th frame and divide the sample rate by *factor* (duration
    preserved; no anti-alias filter — plain decimation, the convention
    a SQL oracle can replay index-by-index).  Multi-channel input keeps
    channel 0 (documented mono output).  Same mapInPandas shape and
    payload-shrinking rationale as resize_images."""
    def _batches(pdf_iter):
        import numpy as np
        import pandas as pd
        for pdf in pdf_iter:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples, n_ch = decode_audio(bytes(payload))
                frames = samples.reshape(-1, n_ch)[:, 0]
                dec = frames[::factor]
                new_rate = max(1, rate // factor)
                out.append((int(mid), int(dec.size), int(new_rate),
                            encode_wav(dec, sample_rate=new_rate),
                            round(float(np.abs(dec.astype(np.int64))
                                        .mean()), 6)))
            yield pd.DataFrame(out, columns=[
                "media_id", "n_samples", "sample_rate", "payload",
                "mean_abs"])

    import pandas as pd  # noqa: F401
    from versa_spark.shipping import ensure_shipped
    ensure_shipped(media.sparkSession)
    return media.mapInPandas(_batches, RESAMPLE_SCHEMA)
