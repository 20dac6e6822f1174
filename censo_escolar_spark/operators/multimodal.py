"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The 100 TB training-data pattern: media payloads travel as a ``binary``
column next to a typed metadata struct; everything cheap (format
sniffing, sizing, frame-index planning) is a native JVM expression over
the bytes, and only the genuinely pixel-level work (decode, resize,
feature extraction) crosses into Python — as Arrow-batched
``mapInPandas`` over bounded batches, never per-row UDFs.

Decoders are pluggable. ``real_decode`` import-probes the preferred
codec library per media family (Pillow, soundfile) and falls back to
pure-stdlib decoders for the open formats — PNG via ``zlib``/``struct``
(RFC 2083), WAV via the ``wave`` module — so the real path runs even in
lib-less environments; only formats with no stdlib codec (JPEG without
Pillow, video containers) raise ``NotImplementedError`` (clearly-marked
stub). ``fake_decode`` is a deterministic stand-in (pixels derived from
a splitmix64 stream seeded by the payload) that keeps the Spark-side
plumbing — schema, batch shape, partitioning, feature math — SQL-oracle
checkable. Swapping decoders changes ONE function argument.

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_decode_stdlib(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (``zlib`` + ``struct`` — the format is
    public: RFC 2083). Supports the mainstream profile: 8-bit depth,
    color types 0/2/3/4/6, filters 0–4, no interlace. Grayscale
    conversion uses Pillow's exact ITU-R 601-2 integer formula
    ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16`` so the stdlib and
    Pillow paths are bit-identical on the same payload."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (bad 8-byte signature)")
    pos = len(_PNG_SIG)
    idat: list[bytes] = []
    plte: np.ndarray | None = None
    ihdr = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"stdlib PNG decoder handles 8-bit non-interlaced only "
            f"(got depth={depth}, interlace={interlace}); install Pillow"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline stream has the wrong length")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    ul = int(prev[i - bpp]) if i >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        prev = cur
        img[y] = cur.astype(np.uint8)
    px = img.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        px = plte[px[:, :, 0]]
        channels = 3
    if channels in (1, 2):  # gray / gray+alpha
        return np.ascontiguousarray(px[:, :, 0])
    r = px[..., 0].astype(np.uint32)
    g = px[..., 1].astype(np.uint32)
    b = px[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def _wav_decode_stdlib(payload: bytes) -> np.ndarray:
    """Pure-stdlib WAV decode via the ``wave`` module: PCM 8/16-bit →
    mono float64 in [-1, 1], matching soundfile's scaling (int16/32768,
    (uint8-128)/128) so the stdlib and soundfile paths are bit-identical
    on the same PCM payload."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as wv:
        nch = wv.getnchannels()
        sw = wv.getsampwidth()
        raw = wv.readframes(wv.getnframes())
    if sw == 2:
        samples = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        samples = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(
            f"stdlib WAV decoder handles 8/16-bit PCM only (got width {sw}); "
            "install soundfile"
        )
    if nch > 1:  # downmix to mono
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples


def _quantize_frames(samples: np.ndarray, *, frame: int = 64) -> np.ndarray:
    """Shared audio→thumbnail contract: mono [-1, 1] samples quantized to
    uint8 and framed into fixed ``frame``-wide rows. Trailing partial
    frames are ALWAYS dropped; a clip shorter than one frame yields the
    (1, 1) zero thumbnail (the same undecodable-floor as empty audio),
    so the contract has no short-clip exception."""
    q = np.clip((samples + 1.0) * 127.5, 0, 255).astype(np.uint8)
    n = (len(q) // frame) * frame
    if n == 0:
        return np.zeros((1, 1), np.uint8)
    return q[:n].reshape(-1, frame)


def real_decode(payload: bytes, fmt: str) -> np.ndarray:
    """Real codec decode. Per media family, the preferred library is
    import-probed (Pillow for images, soundfile for audio) with a
    pure-stdlib fallback for the open formats — PNG via ``zlib`` +
    ``struct``, WAV via the ``wave`` module — so the real-decode path
    runs (and is golden-tested) even in lib-less environments. The two
    paths are bit-identical on the same payload (same grayscale formula,
    same PCM scaling). JPEG has no stdlib decoder: without Pillow it
    raises ``NotImplementedError`` (clearly-marked stub), as does any
    unwired format; ``decoder=fake_decode`` remains the deterministic
    oracle path (m02/m03's splitmix64 SQL replay)."""
    if fmt in ("jpeg", "png"):
        try:
            from PIL import Image
        except ImportError as exc:
            if fmt == "png":
                return _png_decode_stdlib(payload)
            raise NotImplementedError(
                "decoding jpeg requires Pillow, which is not installed; "
                "pass decoder=fake_decode for deterministic testing"
            ) from exc
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    if fmt == "wav":
        try:
            import soundfile as sf
        except ImportError:
            return _quantize_frames(_wav_decode_stdlib(payload))
        import io

        samples, _rate = sf.read(io.BytesIO(payload), dtype="float64")
        if samples.ndim > 1:  # downmix to mono
            samples = samples.mean(axis=1)
        return _quantize_frames(samples)
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


#: 8-point DCT-II basis cos((2x+1)·u·π/16), scaled by 1e6 and rounded to
#: a FIXED integer table — perceptual-hash coefficients become exact
#: BIGINT sums, bit-identical across engines, partitionings, and BLAS
#: builds (a float DCT would be fold-order-dependent and unhashable).
import math as _math

DCT8_SCALE = 1_000_000
DCT8 = [
    [round(_math.cos((2 * x + 1) * u * _math.pi / 16) * DCT8_SCALE) for x in range(8)]
    for u in range(8)
]


def phash64(decoded: DataFrame, *, id_col: str = "id") -> DataFrame:
    """Perceptual hash from decoded 8×8 grayscale thumbnails: the sign
    bits of the 63 non-DC integer-scaled 2D DCT-II coefficients packed
    into one BIGINT (bit u*8+v-1 set iff C(u,v) > 0) — the classic
    pHash shape (DCT low-frequency signs survive resizing, recompression
    and small edits; the DC term only encodes brightness and is
    dropped). 63 bits keep the hash strictly positive, so no engine
    needs wrapping arithmetic.

    Plan shape: pixels explode to (id, i, px) — 64 narrow rows per image
    — then two 64-row broadcast joins against the DCT basis fan out to
    4096 integer terms per image, partial-aggregated into 64
    coefficients and one packed hash. All JVM-side exact BIGINT
    arithmetic (max |term| ≈ 1.6e16 ≪ 2^63): the only Python is the
    decode itself. At 100 TB the 4096-term fan-out is trivia next to
    decode cost and combines map-side.
    """
    spark = decoded.sparkSession
    basis = [(u, x, DCT8[u][x]) for u in range(8) for x in range(8)]
    tu = spark.createDataFrame(basis, "u int, x int, tu bigint")
    tv = spark.createDataFrame(basis, "v int, y int, tv bigint")
    px = (
        decoded.select(F.col(id_col), F.posexplode("pixels").alias("i", "px"))
        # ravel() is row-major over (h, w): i = y*8 + x
        .withColumn("x", (F.col("i") % 8).cast("int"))
        .withColumn("y", (F.col("i") / 8).cast("int"))
    )
    coef = (
        px.join(F.broadcast(tu), "x")
        .join(F.broadcast(tv), "y")
        .groupBy(id_col, "u", "v")
        .agg(F.sum(F.col("px") * F.col("tu") * F.col("tv")).alias("c"))
    )
    # F.shiftleft only takes a literal shift count — the per-row bit
    # position needs the SQL form
    bit_val = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(u * 8 + v - 1 AS INT))")
    return (
        coef.filter((F.col("u") != 0) | (F.col("v") != 0))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("c") > 0, bit_val).otherwise(F.lit(0).cast("bigint"))
            ).alias("phash")
        )
    )


def phash_pairs(
    hashes: DataFrame,
    id_col: str,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes: pigeonhole
    band join (any pair within ``max_hamming`` agrees exactly on at
    least one of ``n_bands`` 16-bit chunks — exact recall requires
    ``max_hamming < n_bands``), then exact Hamming verification via
    bit_count(xor).

    Two-level, like ``operators/fuzzy.fuzzy_self_pairs``: candidates
    are generated over DISTINCT hash VALUES, then matched value pairs
    expand back to record pairs through output-proportional hash
    joins. Identical hashes (the dominant real-corpus case — exact
    re-uploads form huge cliques) therefore cost one join fan-out
    each, never a per-record band join: the record-level formulation
    put every m-clique through all ``n_bands`` bands (m² · bands
    candidate rows) and needed a record-pair ``distinct`` to collapse
    them (measured 52× wall at the 10× scale probe, m10). Value-level
    candidates are Σ per-(band, chunk) C(distinct values, 2) — never
    worse, and the verification bit_count runs once per value pair.
    Shuffle is O(distinct hashes × bands) + O(output)."""
    assert max_hamming < n_bands, "pigeonhole exactness requires max_hamming < n_bands"
    vals = hashes.select("phash").distinct()
    banded = vals.select(
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .cast("int")
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    # each unordered VALUE pair once per shared band -> distinct over
    # the (tiny) verified value-pair set, never over record pairs
    vpairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.phash") < F.col("b.phash")),
        )
        .select(
            F.col("a.phash").alias("__pha"),
            F.col("b.phash").alias("__phb"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("__pha").bitwiseXOR(F.col("__phb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    ra = hashes.select(F.col(id_col).alias("__ida"), F.col("phash").alias("__pha"))
    rb = hashes.select(F.col(id_col).alias("__idb"), F.col("phash").alias("__phb"))
    cross = (
        vpairs.join(ra, "__pha")
        .join(rb, "__phb")
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
            "hamming",
        )
    )
    same = (
        ra.join(rb.withColumnRenamed("__phb", "__pha"), "__pha")
        .filter(F.col("__ida") < F.col("__idb"))
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


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
