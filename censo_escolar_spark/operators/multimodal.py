"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The 100 TB training-data pattern: media payloads travel as a ``binary``
column next to a typed metadata struct; everything cheap (format
sniffing, sizing, frame-index planning) is a native JVM expression over
the bytes, and only the genuinely pixel-level work (decode, resize,
feature extraction) crosses into Python — as Arrow-batched
``mapInPandas`` over bounded batches, never per-row UDFs.

Decoders are pluggable because the real codec libraries (Pillow,
ffmpeg, torchaudio, ...) are NOT in this environment: ``decode_media``
with no decoder raises ``NotImplementedError`` (clearly-marked stub),
while ``fake_decode`` is a deterministic stand-in (pixels derived from a
splitmix64 stream seeded by the payload) that makes the Spark-side
plumbing — schema, batch shape, partitioning, feature math — fully
testable. Swapping in a real decoder changes ONE function.

Scale notes:
- payload columns are large: size shuffle partitions by bytes, not rows
  (``repartition_by_bytes``), and bound Arrow batches via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when decoding;
- metadata-only pipelines (sniff/stats/plan) never deserialize payloads
  into Python — column pruning drops the binary column when unused.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from censo_escolar_spark.functions.hashing import splitmix64

#: Magic-byte prefixes → media format (hex, uppercase). Public file
#: signatures; extend freely.
MAGIC_PREFIXES = (
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("52494646", "wav"),  # RIFF container
    ("000000", "mp4"),  # ISO BMFF size-box prefix (heuristic)
)


def sniff_format(bytes_col: str | Column) -> Column:
    """Media format from magic bytes — pure JVM expression, no decode."""
    c = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    head = F.upper(F.hex(F.substring(c, 1, 4)))
    expr = F.lit(None).cast("string")
    for prefix, fmt in reversed(MAGIC_PREFIXES):
        expr = F.when(head.startswith(prefix), fmt).otherwise(expr)
    return expr


def media_metadata(bytes_col: str | Column) -> Column:
    """Typed metadata struct computed without decoding: format, byte size,
    and a 64-bit content hash (dedup / cache key)."""
    c = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    return F.struct(
        sniff_format(c).alias("format"),
        F.octet_length(c).alias("n_bytes"),
        F.xxhash64(c).alias("content_hash"),
    )


def plan_frame_sample(n_frames_col: str | Column, k: int) -> Column:
    """Indices of ``k`` evenly-spaced frames out of ``n_frames`` — the
    metadata-only half of video frame sampling (the decode of those
    frames is the pluggable-decoder half). Matches the standard
    floor(i * n / k) spacing; fewer than k frames → all frames."""
    n = F.col(n_frames_col) if isinstance(n_frames_col, str) else n_frames_col
    return F.when(
        n <= k, F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.floor(i * n / F.lit(k)).cast("int"),
        )
    )


def repartition_by_bytes(
    df: DataFrame, bytes_col: str, *, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Partition a payload table by total BYTES, not rows — media sizes are
    wildly skewed, so row-count partitioning makes straggler tasks. One
    cheap count+sum pass sizes the shuffle; round-robin spread."""
    total = df.select(F.sum(F.octet_length(bytes_col))).first()[0] or 0
    n_parts = max(1, int(total / target_partition_bytes) + 1)
    return df.repartition(n_parts)


# --------------------------------------------------------------------------
# Decoders: (payload bytes, fmt) -> np.ndarray of shape (h, w) grayscale.
# --------------------------------------------------------------------------

Decoder = Callable[[bytes, str], np.ndarray]


def fake_decode(payload: bytes, fmt: str, *, h: int = 8, w: int = 8) -> np.ndarray:
    """DETERMINISTIC FAKE DECODER (the real codec libs are not in this
    container). Pixels are a splitmix64 stream seeded by the payload's
    first/last bytes and length — stable across runs and processes, so
    feature tests have golden values. Shape mimics a tiny grayscale
    thumbnail; real decoders return (h, w) uint8 exactly the same way."""
    seed = (len(payload) << 16) ^ (payload[0] if payload else 0) ^ (
        (payload[-1] << 8) if payload else 0
    )
    vals = splitmix64(seed, h * w)
    return (vals % np.uint64(256)).astype(np.uint8).reshape(h, w)


def real_decode(payload: bytes, fmt: str) -> np.ndarray:
    """Real codec decode, gated on an import-probe per media family:
    images via Pillow (grayscale uint8 ``(h, w)``, the exact
    ``fake_decode`` contract), audio via soundfile (mono samples
    quantized to uint8 and framed into a 2-D array so the downstream
    resize/feature plumbing is shared). When the library for the
    sniffed format is absent — all of them in this container — raises
    ``NotImplementedError``; pass ``decoder=fake_decode`` for the
    deterministic oracle path (m02/m03's splitmix64 SQL replay)."""
    if fmt in ("jpeg", "png"):
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                f"decoding {fmt} requires Pillow, which is not installed; "
                "pass decoder=fake_decode for deterministic testing"
            ) from exc
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    if fmt == "wav":
        try:
            import soundfile as sf
        except ImportError as exc:
            raise NotImplementedError(
                "decoding wav requires soundfile, which is not installed; "
                "pass decoder=fake_decode for deterministic testing"
            ) from exc
        import io

        samples, _rate = sf.read(io.BytesIO(payload), dtype="float64")
        if samples.ndim > 1:  # downmix to mono
            samples = samples.mean(axis=1)
        q = np.clip((samples + 1.0) * 127.5, 0, 255).astype(np.uint8)
        frame = 64  # fixed frame width; trailing partial frame dropped
        n = (len(q) // frame) * frame
        if n == 0:
            return q.reshape(1, -1) if len(q) else np.zeros((1, 1), np.uint8)
        return q[:n].reshape(-1, frame)
    raise NotImplementedError(
        f"no decoder wired for format {fmt!r}; "
        "pass decoder=fake_decode for deterministic testing"
    )


# Back-compat name: the default `decoder=` argument below predates the
# import-probed implementation.
real_decode_stub = real_decode


def decode_media(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    decoder: Decoder = real_decode_stub,
    out_h: int = 8,
    out_w: int = 8,
) -> DataFrame:
    """Decode + resize: (id, payload) → (id, h, w, pixels array<int>).

    mapInPandas so one Arrow batch crosses the JVM↔Python boundary per
    ~10k rows (not per row); the decoder runs inside the iterator. Resize
    here is nearest-neighbor index sampling — replace alongside the
    decoder when real libs exist.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads are undecodable — drop them here rather than
            # kill the task; quarantine upstream if they must be kept.
            pdf = pdf[pdf[bytes_col].notna()]
            pixels = []
            for payload, fmt in zip(pdf[bytes_col], pdf["__fmt"]):
                img = decoder(bytes(payload), fmt)
                yi = (np.arange(out_h) * img.shape[0] // out_h)[:, None]
                xi = (np.arange(out_w) * img.shape[1] // out_w)[None, :]
                pixels.append(img[yi, xi].astype(np.int64).ravel())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "h": np.full(len(pdf), out_h, dtype=np.int32),
                    "w": np.full(len(pdf), out_w, dtype=np.int32),
                    "pixels": pixels,
                }
            )

    prepped = df.select(
        F.col(id_col), F.col(bytes_col), sniff_format(bytes_col).alias("__fmt")
    )
    return prepped.mapInPandas(run, "id long, h int, w int, pixels array<long>")


def media_features(decoded: DataFrame, *, n_bins: int = 8) -> DataFrame:
    """Pixel-level features from decoded thumbnails — JVM-side over the
    array column (mean/std/histogram), so only the decode itself ever
    touched Python."""
    px = F.col("pixels")
    n = F.size(px)
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x) / n
    bin_width = 256 // n_bins
    hist = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda b: F.size(
            F.filter(px, lambda x: F.floor(x / bin_width) == b.cast("bigint"))
        ),
    )
    return decoded.select(
        "id",
        mean.alias("px_mean"),
        F.sqrt(
            F.aggregate(px, F.lit(0.0), lambda a, x: a + x * x) / n - mean * mean
        ).alias("px_std"),
        hist.alias("px_hist"),
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    n_frames_col: str = "n_frames",
    k: int = 4,
    decoder: Decoder = real_decode_stub,
) -> DataFrame:
    """Execute the frame-sample plan end to end: each payload's k
    evenly-spaced frame indices (``plan_frame_sample``) are decoded —
    the decoder is called once per (payload, frame_idx), with the index
    mixed into the payload so distinct frames decode distinctly — and
    summarized to (id, frame_idx, px_mean, px_std).

    Scale shape: the plan explode is a narrow per-row fan-out (k rows
    per media, no shuffle); the decode crosses into Python once per
    Arrow batch via ``mapInPandas``; NULL payloads drop (same rule as
    decode_media). Per-frame seeking in a real container format
    belongs in the decoder (pyav `seek`), not the Spark plan — the
    plumbing here is identical either way.
    """
    planned = df.filter(F.col(bytes_col).isNotNull()).select(
        F.col(id_col),
        F.col(bytes_col),
        F.explode(plan_frame_sample(n_frames_col, k)).alias("frame_idx"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            ids, idxs, means, stds = [], [], [], []
            for rid, payload, idx in zip(
                pdf[id_col], pdf[bytes_col], pdf["frame_idx"]
            ):
                img = decoder(bytes(payload) + bytes([idx % 256]), "frame")
                ids.append(rid)
                idxs.append(idx)
                # stats from EXACT integer moments with one fixed float
                # expression each (not np.mean/np.std, whose pairwise
                # float folds are summation-order-dependent): pixel sums
                # are exact in int64, so mean/std are bit-reproducible
                # on any batch split — and SQL-oracle-checkable
                arr = img.astype(np.int64).ravel()
                s1 = int(arr.sum())
                s2 = int((arr * arr).sum())
                n = arr.size
                mean = s1 / n
                means.append(mean)
                stds.append(math.sqrt(s2 / n - mean * mean))
            yield pd.DataFrame(
                {
                    id_col: np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "px_mean": np.asarray(means, dtype=np.float64),
                    "px_std": np.asarray(stds, dtype=np.float64),
                }
            )

    return planned.mapInPandas(
        run, f"{id_col} long, frame_idx int, px_mean double, px_std double"
    )


def plan_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    shard_budget: int = 1 << 16,
    bucket_size: int = 100,
) -> DataFrame:
    """Offset-based shard plan for packing media payloads into
    ~``shard_budget``-byte archive shards (the WebDataset/tar-shard
    layout step before training ingestion).

    Every payload gets a virtual byte offset = the cumulative size of
    its predecessors in deterministic id order; its shard is
    ``offset div budget``. Shards may run over budget by at most one
    payload's tail — the price for a plan that is a pure function of
    (sizes, order), reproducible on any partitioning.

    Scale shape: the running sum is windowed per BUCKET (``id div
    bucket_size``), never globally — each bucket is an independent
    shard namespace, so the plan parallelizes to any corpus size
    (shard ids are (bucket, idx) pairs). One shuffle on the bucket.
    """
    size = F.octet_length(F.col(bytes_col)).cast("bigint")
    w = (
        Window.partitionBy("shard_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = df.select(
        F.col(id_col),
        (F.col(id_col) / bucket_size).cast("long").alias("shard_bucket"),
        size.alias("n_bytes"),
    )
    off = F.coalesce(F.sum("n_bytes").over(w), F.lit(0))
    # BIGINT floor division (never a double route: cumulative bytes at
    # corpus scale exceed double's exact-integer range)
    return sized.select(
        id_col, "shard_bucket", "n_bytes", off.alias("__off")
    ).select(
        id_col,
        "shard_bucket",
        "n_bytes",
        F.expr(f"__off div {int(shard_budget)}").cast("long").alias("shard_idx"),
        F.expr(f"__off % {int(shard_budget)}").cast("bigint").alias("byte_offset"),
    )


def plan_audio_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    rate_col: str = "sample_rate",
    channels_col: str = "channels",
    frame_len: int = 1024,
    hop: int = 512,
) -> DataFrame:
    """Audio framing plan over raw PCM (s16le) payloads: one row per
    fully-contained analysis frame, with its sample/byte offsets and
    start time. The plan half of an audio feature pipeline (the decode
    half — RMS/FFT per frame — is an Arrow batch over these offsets,
    same split as image decode in ``sample_frames``).

    Everything is BIGINT arithmetic on (octet_length, rate, channels) —
    no payload byte ever leaves the JVM, so the plan is oracle-checkable
    and the scan can prune the binary column entirely. Frame count per
    payload is ``(n_samples - frame_len) div hop + 1`` (payloads shorter
    than one frame emit nothing); the explode fan-out is proportional to
    audio duration, the same narrow shape as token chunking.
    """
    sized = df.select(
        F.col(id_col),
        F.col(rate_col).cast("bigint").alias("sample_rate"),
        F.col(channels_col).cast("bigint").alias("channels"),
        F.expr(f"octet_length({bytes_col}) div ({channels_col} * 2)")
        .cast("bigint")
        .alias("n_samples"),
    )
    framed = sized.select(
        "*",
        F.when(
            F.col("n_samples") < frame_len, F.lit(0).cast("bigint")
        )
        .otherwise(
            F.expr(f"(n_samples - {frame_len}) div {hop}").cast("bigint") + 1
        )
        .alias("n_frames"),
        F.expr("n_samples * 1000000 div sample_rate")
        .cast("bigint")
        .alias("duration_us"),
    )
    frames = framed.filter(F.col("n_frames") > 0).select(
        "*", F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1)).alias("frame_idx")
    )
    return frames.select(
        id_col,
        "sample_rate",
        "channels",
        "n_samples",
        "n_frames",
        "duration_us",
        "frame_idx",
        (F.col("frame_idx") * hop).alias("sample_offset"),
        (F.col("frame_idx") * hop * F.col("channels") * 2).alias("byte_offset"),
        F.expr(f"frame_idx * {hop} * 1000000 div sample_rate")
        .cast("bigint")
        .alias("frame_start_us"),
    )
