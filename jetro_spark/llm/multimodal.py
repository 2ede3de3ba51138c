"""Multimodal columns: opaque binary content + typed metadata.

Model (brief: "treat image/audio/video as opaque binary columns with
typed metadata"): a row = {content: binary, meta: struct<mime, width,
height, n_frames, duration_ms, sample_rate>}. The Spark-side plumbing —
schemas, Arrow-batched mapInPandas, partition shape — is real and
tested. Codecs auto-wire when a public library is importable (PIL for
images, soundfile or the stdlib ``wave`` module for audio); the stdlib
BMP/PNG codec (:mod:`jetro_spark.llm.purepy_image`, r11) covers the
real image branch where PIL isn't shipped; otherwise decode raises
NotImplementedError unless `fake=True` selects the deterministic fake
used by the oracle gate.

At 100 TB: binary payloads stay columnar (parquet binary), metadata
predicates push down (filter on meta.mime never touches content bytes),
and the Pandas UDFs stream Arrow batches — per-batch memory is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch, not partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType([
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
])


def binary_table(df: DataFrame, content_col: str, mime: str,
                 id_col: str) -> DataFrame:
    """Wrap raw bytes into the canonical multimodal layout."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(content_col).alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from a content hash
    (stable across runs/executors). Replaces PIL in this container."""
    h = hashlib.sha256(content or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_images(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Fill meta.width/height by decoding content. Arrow-batched
    mapInPandas; output schema = input schema (meta updated in place)."""
    schema = df.schema

    def run(batches: Iterator) -> Iterator:
        # real codec auto-wired when importable (r8): PIL is public and
        # optional; the stdlib BMP/PNG codec (purepy_image, r11) covers
        # the real branch where PIL isn't shipped; the deterministic
        # fake stays the oracle-gate path so correctness rows never
        # depend on an optional dependency. The import lives INSIDE the
        # task so executors probe their own environment, not the
        # driver's.
        Image = None
        if not fake:
            try:
                from PIL import Image  # noqa: PLC0415
            except ImportError:
                Image = None
        from jetro_spark.llm import purepy_image as PP  # noqa: PLC0415
        import io

        def real_size(raw: bytes) -> tuple[int, int]:
            if Image is not None:
                with Image.open(io.BytesIO(raw)) as im:
                    return im.size
            if PP.probe(raw):
                return PP.decode_size(raw)
            raise NotImplementedError(
                "real decode of this format needs PIL (pip install "
                "pillow) — not shipped in this container; the stdlib "
                "codec handles BMP/PNG only; pass fake=True for the "
                "deterministic test double")

        for pdf in batches:
            widths, heights = [], []
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b""
                if fake:
                    w, h = _fake_decode(raw)
                else:
                    w, h = real_size(raw)
                widths.append(w)
                heights.append(h)
            meta = pdf["meta"]
            pdf["meta"] = [
                {**(m or {}), "width": w, "height": h}
                for m, w, h in zip(meta, widths, heights)
            ]
            yield pdf

    return df.mapInPandas(run, schema)


def _fake_audio_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake audio decode → (sample_rate, n_frames,
    duration_ms), hash-derived like :func:`_fake_decode`."""
    h = hashlib.sha256(content or b"").digest()
    rate = (8000, 16000, 22050, 44100)[h[0] % 4]
    n_frames = 1000 + int.from_bytes(h[1:4], "big") % 100_000
    return rate, n_frames, n_frames * 1000 // rate


def decode_audio(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Fill meta.sample_rate/n_frames/duration_ms by decoding content.
    Arrow-batched mapInPandas; output schema = input schema (meta
    updated in place) — the audio twin of :func:`decode_images`.

    Real codec auto-wiring (r9, mirroring the r8 PIL pattern):
    ``soundfile`` (libsndfile — any format) when importable, else the
    stdlib ``wave`` module for WAV/PCM bytes; the deterministic fake
    stays the oracle-gate path so correctness rows never depend on an
    optional dependency. Imports live INSIDE the task so executors
    probe their own environment, not the driver's."""
    schema = df.schema

    def run(batches: Iterator) -> Iterator:
        sf = None
        if not fake:
            try:
                import soundfile as sf  # noqa: PLC0415
            except ImportError:
                sf = None
        import io
        import wave

        def real_decode(raw: bytes) -> tuple[int, int, int]:
            if sf is not None:
                with sf.SoundFile(io.BytesIO(raw)) as snd:
                    rate, nf = snd.samplerate, len(snd)
                    return rate, nf, nf * 1000 // rate
            try:
                with wave.open(io.BytesIO(raw)) as w:
                    rate, nf = w.getframerate(), w.getnframes()
                    return rate, nf, nf * 1000 // rate
            except wave.Error as exc:
                raise NotImplementedError(
                    "non-WAV audio decode needs soundfile (pip install "
                    "soundfile) — not shipped in this container; pass "
                    "fake=True for the deterministic test double") from exc

        for pdf in batches:
            rates, frames, durs = [], [], []
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b""
                if fake:
                    rate, nf, ms = _fake_audio_decode(raw)
                else:
                    rate, nf, ms = real_decode(raw)
                rates.append(rate)
                frames.append(nf)
                durs.append(ms)
            meta = pdf["meta"]
            pdf["meta"] = [
                {**(m or {}), "sample_rate": r, "n_frames": nf,
                 "duration_ms": ms}
                for m, r, nf, ms in zip(meta, rates, frames, durs)
            ]
            yield pdf

    return df.mapInPandas(run, schema)


def transform_images(df: DataFrame, *, max_side: int = 256,
                     fake: bool = False) -> DataFrame:
    """Resize + EXIF-orientation extraction — the image transform a
    100 TB ingest pipeline runs right after decode (r10 verdict item).

    Aspect-preserving downscale so max(width, height) <= ``max_side``
    (never upscales), with the EXIF orientation tag (274) surfaced as a
    column so a downstream normalize step can rotate. Output = input
    layout with ``content`` replaced by the re-encoded thumbnail,
    meta.width/height updated to the new dimensions, plus an
    ``orientation`` int column (EXIF values 1-8; 1 = upright).

    Real path (PIL, auto-wired like decode_images): ``Image.thumbnail``
    + ``getexif().get(274, 1)``, re-encoded PNG. Fake path (the oracle
    gate): dimensions/orientation are sha256-derived like
    :func:`_fake_decode`, the scale math is exact integer floor
    division (``new_w = max(1, w * max_side // max(w, h))``) so DuckDB
    replays it bit-for-bit, and the thumbnail bytes are the content's
    sha256 digest.

    At 100 TB this is the same Arrow-batched mapInPandas shape as
    decode: per-batch memory bounded by arrow.maxRecordsPerBatch, no
    shuffle, content column pruned upstream when only meta is read."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("orientation", T.IntegerType(), True)])

    def run(batches: Iterator) -> Iterator:
        Image = None
        if not fake:
            try:
                from PIL import Image  # noqa: PLC0415
            except ImportError:
                Image = None
        from jetro_spark.llm import purepy_image as PP  # noqa: PLC0415
        import io

        def real_resize(raw: bytes) -> tuple[bytes, int, int, int]:
            if Image is not None:
                with Image.open(io.BytesIO(raw)) as im:
                    orient = int(im.getexif().get(274, 1))
                    im.thumbnail((max_side, max_side))
                    w, h = im.size
                    buf = io.BytesIO()
                    im.save(buf, format="PNG")
                    return buf.getvalue(), w, h, orient
            if PP.probe(raw):
                # stdlib leg (r11): nearest-neighbor thumbnail with the
                # SAME never-upscale floor-scale math as the fake path;
                # BMP/PNG carry no EXIF → orientation 1
                w, h, ch, px = PP.decode_pixels(raw)
                mx = max(w, h)
                if mx > max_side:
                    nw = max(1, w * max_side // mx)
                    nh = max(1, h * max_side // mx)
                    px = PP.resize_nearest(w, h, ch, px, nw, nh)
                    w, h = nw, nh
                return PP.encode_png(w, h, ch, px), w, h, 1
            raise NotImplementedError(
                "real resize of this format needs PIL (pip install "
                "pillow) — not shipped in this container; the stdlib "
                "codec handles BMP/PNG only; pass fake=True for the "
                "deterministic test double")

        for pdf in batches:
            contents, widths, heights, orients = [], [], [], []
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b""
                if fake:
                    w, h = _fake_decode(raw)
                    d = hashlib.sha256(raw).digest()
                    orient = 1 + d[4] % 8
                    mx = max(w, h)
                    if mx > max_side:
                        w = max(1, w * max_side // mx)
                        h = max(1, h * max_side // mx)
                    out_bytes = d
                else:
                    out_bytes, w, h, orient = real_resize(raw)
                contents.append(out_bytes)
                widths.append(w)
                heights.append(h)
                orients.append(orient)
            pdf["content"] = contents
            meta = pdf["meta"]
            pdf["meta"] = [
                {**(m or {}), "width": w, "height": h}
                for m, w, h in zip(meta, widths, heights)
            ]
            pdf["orientation"] = orients
            yield pdf

    return df.mapInPandas(run, out_schema)


def extract_features(df: DataFrame, dim: int = 8, *,
                     fake: bool = False) -> DataFrame:
    """content → float feature vector (the embed step of a multimodal
    pipeline). Stub: sha256-derived deterministic vector; a real model
    would batch onto an accelerator inside the same mapInPandas shape."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()), True)])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                if not fake:
                    raise NotImplementedError(
                        "real feature extraction needs a vision/audio model; "
                        "pass fake=True for the deterministic test double")
                raw = hashlib.sha256(
                    bytes(content) if content is not None else b"").digest()
                feats.append([raw[i] / 255.0 for i in range(dim)])
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling: one output row per sampled frame index
    (meta.n_frames driven, no decode needed — pure expressions)."""
    idx = F.sequence(F.lit(0),
                     F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                     F.lit(every_n))
    return (df.filter(F.col("meta.n_frames").isNotNull()
                      & (F.col("meta.n_frames") > 0))
            .withColumn("frame_idx", F.explode(idx)))
