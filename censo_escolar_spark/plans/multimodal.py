"""Multimodal-column queries: binary payload plumbing, driver-checked.

No media fixture exists, so payloads are STAGED from documents.text —
utf-8 bytes behind a planted magic prefix keyed on doc_id — and pushed
through the real operators (operators/multimodal.py). m01 keeps every
output JVM-computable so the DuckDB oracle hash-checks the whole binary
path (concat/sniff/octet_length/md5 over identical bytes); m02/m03 run
the decode → feature pipelines on the deterministic fake decoder AND
are still oracle-checked: the decoder is a splitmix64 stream, which the
oracles replay in SQL via HUGEINT split-multiplication, so even the
Arrow decode paths are value-hash-verified end to end (golden tests
additionally in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from censo_escolar_spark.operators import multimodal as M
from censo_escolar_spark.plans.registry import register
from censo_escolar_spark.sources.readers import load_table, table_rows

#: doc_id % 3 → planted magic prefix (hex) and the format it sniffs as.
_PLANT = {0: "FFD8FF", 1: "89504E47", 2: "52494646"}


def _staged_payloads(
    spark: SparkSession, sf_dir: str, *, spread: bool = False
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    if spread:
        # consumers that run the full Arrow DECODE pass over these
        # payloads (m02's feature pipeline, m03's frame sampling) are
        # CPU-dense per byte, so an unsplittable harness-scale scan must
        # not serialize them onto one task (guide §2.5; m02 measured a
        # 2.7 s single-task decode stage; in-session A/B: m02 −0.27 s,
        # m03 −0.37 s). Header-only or matmul-light consumers measured
        # the extra exchange as a LOSS (m01 +0.19, m09 +0.37) and stay
        # un-spread. No-op for many-file corpora either way.
        from censo_escolar_spark.operators.skew import spread_small_input

        docs = spread_small_input(
            docs, "doc_id", rows=table_rows(sf_dir, "documents")
        )
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.unhex(F.lit(_PLANT[0])))
        .when(F.col("doc_id") % 3 == 1, F.unhex(F.lit(_PLANT[1])))
        .otherwise(F.unhex(F.lit(_PLANT[2])))
    )
    return docs.select(
        "doc_id", F.concat(magic, F.encode("text", "utf-8")).alias("payload")
    )


@register(
    "m01_media_metadata",
    oracle="""
    WITH staged AS (
      SELECT doc_id,
        (CASE doc_id % 3 WHEN 0 THEN unhex('FFD8FF')
                         WHEN 1 THEN unhex('89504E47')
                         ELSE unhex('52494646') END
         || encode(text)) AS payload,
        CAST(doc_id % 10 + 1 AS INTEGER) AS n_frames
      FROM documents
    )
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END AS format,
      CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      md5(hex(payload)) AS payload_md5,
      array_to_string(
        CASE WHEN n_frames <= 4
             THEN list_transform(range(0, CAST(greatest(n_frames, 1) AS BIGINT)),
                                 i -> CAST(i AS INTEGER))
             ELSE list_transform(range(0, 4),
                                 i -> CAST((i * n_frames) // 4 AS INTEGER))
        END, ',') AS frame_plan
    FROM staged
    ORDER BY doc_id
    """,
)
def m01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media pipeline: sniff + size + content hash + frame
    plan, all without the payload ever leaving the JVM."""
    staged = _staged_payloads(spark, sf_dir).withColumn(
        "n_frames", (F.col("doc_id") % 10 + 1).cast("int")
    )
    meta = M.media_metadata("payload")
    return staged.select(
        "doc_id",
        meta["format"].alias("format"),
        meta["n_bytes"].cast("bigint").alias("n_bytes"),
        # md5 over the hex encoding: DuckDB's md5 is VARCHAR-only, and
        # hex(blob) is uppercase-identical in both engines.
        F.md5(F.hex("payload")).alias("payload_md5"),
        F.array_join(M.plan_frame_sample("n_frames", 4), ",").alias("frame_plan"),
    ).orderBy("doc_id")


# m02's oracle replays the DETERMINISTIC fake decoder in SQL: the
# pixel stream is splitmix64(seed, 64) % 256 with seed =
# (octet_length << 16) XOR first_byte XOR (last_byte << 8), and
# splitmix64's wrapping 64-bit arithmetic is expressible in DuckDB via
# HUGEINT split-multiplication (a·b mod 2^64 decomposed through the
# 32-bit halves so no product exceeds INT128). Features then follow
# the exact expression shapes of media_features — integer pixel sums
# are exact in double at n=64, so means/stds hash-match bit for bit.
_SM64_MUL = (
    "((( ({a}) // 4294967296 * {m} % 4294967296) * 4294967296"
    " + ({a}) % 4294967296 * {m}) % 18446744073709551616)"
)


def _fake_pix_ctes(staged_sql: str, first_byte_sql: str) -> str:
    """The splitmix64 fake-decode replay as a reusable CTE chain:
    ``staged_sql`` must yield (doc_id, payload BLOB); ``first_byte_sql``
    is the payload's first byte as SQL (a constant or CASE — DuckDB has
    no cheap blob-byte indexer, and every staging plants a known magic).
    Produces ``pix(doc_id, i, px)`` with i in 1..64."""
    return f"""staged AS ({staged_sql}),
sd AS (
  SELECT doc_id,
    xor(xor(CAST(octet_length(payload) AS UBIGINT) * 65536,
            CAST({first_byte_sql} AS UBIGINT)),
        CAST(CAST('0x' || substr(hex(payload), octet_length(payload)*2 - 1, 2)
             AS INT) * 256 AS UBIGINT)) AS seed
  FROM staged
),
z0 AS (
  SELECT doc_id, i,
    CAST((CAST(seed AS HUGEINT) + CAST(i AS HUGEINT) * 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM sd CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
),
x0 AS (SELECT doc_id, i, CAST(xor(z, z >> 30) AS HUGEINT) AS x FROM z0),
z1 AS (SELECT doc_id, i,
  CAST({_SM64_MUL.format(a='x', m='13787848793156543929')} AS UBIGINT) AS z
  FROM x0),
x1 AS (SELECT doc_id, i, CAST(xor(z, z >> 27) AS HUGEINT) AS x FROM z1),
z2 AS (SELECT doc_id, i,
  CAST({_SM64_MUL.format(a='x', m='10723151780598845931')} AS UBIGINT) AS z
  FROM x1),
pix AS (
  SELECT doc_id, i, CAST(xor(z, z >> 31) % 256 AS BIGINT) AS px FROM z2
)"""


_M02_STAGED = """
  SELECT doc_id,
    (CASE doc_id % 3 WHEN 0 THEN unhex('FFD8FF')
                     WHEN 1 THEN unhex('89504E47')
                     ELSE unhex('52494646') END
     || encode(text)) AS payload
  FROM documents
"""
_M02_FIRST_BYTE = "CASE doc_id % 3 WHEN 0 THEN 255 WHEN 1 THEN 137 ELSE 82 END"
_M02_ORACLE = f"""
WITH {_fake_pix_ctes(_M02_STAGED, _M02_FIRST_BYTE)},
feat AS (
  SELECT doc_id,
    CAST(SUM(px) AS DOUBLE) / 64 AS px_mean,
    sqrt(CAST(SUM(px*px) AS DOUBLE) / 64
         - (CAST(SUM(px) AS DOUBLE) / 64) * (CAST(SUM(px) AS DOUBLE) / 64))
      AS px_std
  FROM pix GROUP BY doc_id
),
hist AS (
  SELECT doc_id, b, COUNT(*) FILTER (WHERE px // 32 = b) AS c
  FROM pix CROSS JOIN (SELECT unnest(range(0, 8)) AS b)
  GROUP BY doc_id, b
),
hs AS (
  SELECT doc_id, array_to_string(list(c ORDER BY b), ',') AS px_hist
  FROM hist GROUP BY doc_id
)
SELECT f.doc_id, f.px_mean, f.px_std, h.px_hist
FROM feat f JOIN hs h ON f.doc_id = h.doc_id
ORDER BY f.doc_id
"""


@register("m02_image_features", oracle=_M02_ORACLE)
def m02_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → resize → feature pipeline on the deterministic fake
    decoder. The decode itself is an Arrow batch (mapInPandas); the
    oracle replays the splitmix64 pixel stream and feature math in SQL
    (see _M02_ORACLE), so even the Python-side decode path is
    value-hash-checked end to end. Golden values additionally pinned in
    tests/test_multimodal.py."""
    staged = _staged_payloads(spark, sf_dir, spread=True)
    decoded = M.decode_media(staged, bytes_col="payload", decoder=M.fake_decode)
    return (
        M.media_features(decoded)
        .select(
            F.col("id").alias("doc_id"),
            "px_mean",
            "px_std",
            F.array_join("px_hist", ",").alias("px_hist"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# m03 — frame sampling EXECUTED: the m01 frame plan's indices are
# decoded (deterministic fake decoder — real codec libs absent) and
# per-frame stats emitted.
# The oracle decodes the SAME frames in SQL: the sampled payload is
# payload || byte(frame_idx % 256), so the splitmix64 seed becomes
# ((octet_length + 1) << 16) XOR first_byte XOR (frame_idx << 8);
# per-frame stats use the exact-integer-moment formulas the operator
# emits (s1/64, sqrt(s2/64 - mean^2)) — bit-identical cross-engine.
_M03_ORACLE = f"""
WITH staged AS (
  SELECT doc_id,
    (CASE doc_id % 3 WHEN 0 THEN unhex('FFD8FF')
                     WHEN 1 THEN unhex('89504E47')
                     ELSE unhex('52494646') END
     || encode(text)) AS payload,
    CAST(doc_id % 10 + 1 AS INTEGER) AS n_frames
  FROM documents
),
planned AS (
  SELECT doc_id, payload,
    CAST(unnest(
      CASE WHEN n_frames <= 4
           THEN list_transform(range(0, CAST(greatest(n_frames, 1) AS BIGINT)),
                               i -> CAST(i AS INTEGER))
           ELSE list_transform(range(0, 4),
                               i -> CAST((i * n_frames) // 4 AS INTEGER))
      END) AS INTEGER) AS frame_idx
  FROM staged
),
sd AS (
  SELECT doc_id, frame_idx,
    xor(xor(CAST(octet_length(payload) + 1 AS UBIGINT) * 65536,
            CAST(CASE doc_id % 3 WHEN 0 THEN 255 WHEN 1 THEN 137
                 ELSE 82 END AS UBIGINT)),
        CAST((frame_idx % 256) * 256 AS UBIGINT)) AS seed
  FROM planned
),
z0 AS (
  SELECT doc_id, frame_idx, i,
    CAST((CAST(seed AS HUGEINT) + CAST(i AS HUGEINT) * 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM sd CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
),
x0 AS (SELECT doc_id, frame_idx, i, CAST(xor(z, z >> 30) AS HUGEINT) AS x FROM z0),
z1 AS (SELECT doc_id, frame_idx, i,
  CAST({_SM64_MUL.format(a='x', m='13787848793156543929')} AS UBIGINT) AS z
  FROM x0),
x1 AS (SELECT doc_id, frame_idx, i, CAST(xor(z, z >> 27) AS HUGEINT) AS x FROM z1),
z2 AS (SELECT doc_id, frame_idx, i,
  CAST({_SM64_MUL.format(a='x', m='10723151780598845931')} AS UBIGINT) AS z
  FROM x1),
pix AS (
  SELECT doc_id, frame_idx, CAST(xor(z, z >> 31) % 256 AS BIGINT) AS px FROM z2
)
SELECT doc_id, frame_idx,
  CAST(SUM(px) AS DOUBLE) / 64 AS px_mean,
  sqrt(CAST(SUM(px*px) AS DOUBLE) / 64
       - (CAST(SUM(px) AS DOUBLE) / 64) * (CAST(SUM(px) AS DOUBLE) / 64))
    AS px_std
FROM pix GROUP BY doc_id, frame_idx
ORDER BY doc_id, frame_idx
"""


@register("m03_frame_samples", oracle=_M03_ORACLE)
def m03_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _staged_payloads(spark, sf_dir, spread=True).withColumn(
        "n_frames", (F.col("doc_id") % 10 + 1).cast("int")
    )
    return M.sample_frames(
        staged, k=4, decoder=M.fake_decode
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# m04 — shard packing plan: every payload gets a (bucket, shard, offset)
# slot for ~64 KB tar-style training shards. Offset-based assignment
# (shard = cumulative-bytes div budget) is a pure function of sizes +
# id order — reproducible on any partitioning; the running sum windows
# per id-bucket, never globally.
# ---------------------------------------------------------------------------
@register(
    "m04_shard_plan",
    oracle="""
    WITH p AS (
      SELECT doc_id,
        doc_id // 100 AS shard_bucket,
        CAST(octet_length(
          (CASE doc_id % 3 WHEN 0 THEN unhex('FFD8FF')
                           WHEN 1 THEN unhex('89504E47')
                           ELSE unhex('52494646') END
           || encode(text))) AS BIGINT) AS n_bytes
      FROM documents
    ),
    o AS (
      SELECT doc_id, shard_bucket, n_bytes,
        COALESCE(SUM(n_bytes) OVER (
          PARTITION BY shard_bucket ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM p
    )
    SELECT doc_id, shard_bucket, n_bytes,
      CAST(off // 65536 AS BIGINT) AS shard_idx,
      CAST(off % 65536 AS BIGINT) AS byte_offset
    FROM o
    ORDER BY doc_id
    """,
)
def m04_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _staged_payloads(spark, sf_dir)
    return M.plan_shards(
        staged, id_col="doc_id", bytes_col="payload", shard_budget=1 << 16
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# m05 — image-text pair curation (LAION-style dataset assembly): join
# the media payloads back to their captions (documents.text), keep only
# still-image formats, apply caption quality floors, and dedup by
# payload content hash keeping the longest caption. The whole pipeline
# is JVM-side (sniff/hash/length are codegen; the dedup winner is a
# per-hash window) — at scale it is one broadcast-free equi-join on
# doc_id, one window partitioned by content hash, no global ordering.
# ---------------------------------------------------------------------------
@register(
    "m05_caption_pairs",
    oracle="""
    WITH staged AS (
      SELECT doc_id,
        (CASE doc_id % 3 WHEN 0 THEN unhex('FFD8FF')
                         WHEN 1 THEN unhex('89504E47')
                         ELSE unhex('52494646') END
         || encode(text)) AS payload
      FROM documents
    ),
    pairs AS (
      SELECT s.doc_id,
        CASE s.doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END
          AS format,
        md5(hex(s.payload)) AS payload_md5,
        CAST(octet_length(s.payload) AS BIGINT) AS n_bytes,
        d.text AS caption,
        CAST(len(string_split(d.text, ' ')) AS BIGINT) AS caption_tokens
      FROM staged s JOIN documents d USING (doc_id)
    ),
    filtered AS (
      SELECT * FROM pairs
      WHERE format IN ('jpeg', 'png') AND caption_tokens BETWEEN 20 AND 95
    )
    SELECT doc_id, format, payload_md5, n_bytes, caption_tokens,
      ROW_NUMBER() OVER (PARTITION BY payload_md5
                         ORDER BY caption_tokens DESC, doc_id) = 1 AS keep
    FROM filtered
    ORDER BY doc_id
    """,
)
def m05_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    staged = _staged_payloads(spark, sf_dir)
    meta = M.media_metadata("payload")
    pairs = staged.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        meta["format"].alias("format"),
        F.md5(F.hex("payload")).alias("payload_md5"),
        meta["n_bytes"].cast("bigint").alias("n_bytes"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias(
            "caption_tokens"
        ),
    )
    filtered = pairs.filter(
        F.col("format").isin("jpeg", "png")
        & F.col("caption_tokens").between(20, 95)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("payload_md5").orderBy(
        F.desc("caption_tokens"), F.asc("doc_id")
    )
    return (
        filtered.withColumn("keep", F.row_number().over(w) == 1)
        .select(
            "doc_id", "format", "payload_md5", "n_bytes", "caption_tokens", "keep"
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# m06 — audio framing plan: raw PCM (s16le) payloads staged from
# documents.text bytes with planted (rate, channels) metadata, framed
# into 64-sample windows with 32-sample hop (staged text payloads
# are short; real audio uses the operator defaults 1024/512). One row per fully-
# contained frame with sample/byte offsets and start time — the plan
# half of an audio feature pipeline; the decode half (per-frame
# RMS/FFT) is an Arrow batch over these offsets, exactly like image
# decode in m02/m03. All BIGINT arithmetic on octet_length + metadata,
# so the whole framing path is oracle-checked and the scan never
# materializes payload bytes for the plan.
# ---------------------------------------------------------------------------
@register(
    "m06_audio_frame_plan",
    oracle="""
    WITH p AS (
      SELECT doc_id,
        CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
        CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ),
    s AS (
      SELECT doc_id, sample_rate, channels,
        n_bytes // (channels * 2) AS n_samples
      FROM p
    ),
    f AS (
      SELECT *,
        CASE WHEN n_samples < 64 THEN 0
             ELSE (n_samples - 64) // 32 + 1 END AS n_frames,
        n_samples * 1000000 // sample_rate AS duration_us
      FROM s
    ),
    fr AS (
      SELECT doc_id, sample_rate, channels, n_samples, n_frames,
        duration_us, unnest(range(0, n_frames)) AS frame_idx
      FROM f WHERE n_frames > 0
    )
    SELECT doc_id, sample_rate, channels, n_samples, n_frames, duration_us,
      CAST(frame_idx AS BIGINT) AS frame_idx,
      CAST(frame_idx * 32 AS BIGINT) AS sample_offset,
      CAST(frame_idx * 32 * channels * 2 AS BIGINT) AS byte_offset,
      CAST(frame_idx * 32 * 1000000 // sample_rate AS BIGINT) AS frame_start_us
    FROM fr
    ORDER BY doc_id, frame_idx
    """,
)
def m06_audio_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        (8000 + (F.col("doc_id") % 3) * 4000).cast("bigint").alias("sample_rate"),
        (1 + F.col("doc_id") % 2).cast("bigint").alias("channels"),
    )
    return M.plan_audio_frames(
        staged, id_col="doc_id", bytes_col="payload", frame_len=64, hop=32
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# m07 — shard-manifest integrity audit: verify the m04 packing plan's
# invariants per (bucket, shard) — offsets start at 0 for a shard's
# first member, every member starts exactly where its predecessor
# ended (contiguity), and only a shard's LAST member may cross the
# shard budget (the documented tail-overrun). The publish gate a
# WebDataset-style writer runs before shipping shards to training.
# One lag window over the plan's own (bucket, shard) partitioning —
# auditing costs one pass over the manifest, never touches payloads.
# ---------------------------------------------------------------------------
@register(
    "m07_shard_audit",
    oracle="""
    WITH p AS (
      SELECT doc_id,
        doc_id // 100 AS shard_bucket,
        CAST(octet_length(
          (CASE doc_id % 3 WHEN 0 THEN unhex('FFD8FF')
                           WHEN 1 THEN unhex('89504E47')
                           ELSE unhex('52494646') END
           || encode(text))) AS BIGINT) AS n_bytes
      FROM documents
    ),
    o AS (
      SELECT doc_id, shard_bucket, n_bytes,
        COALESCE(SUM(n_bytes) OVER (
          PARTITION BY shard_bucket ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM p
    ),
    plan AS (
      SELECT doc_id, shard_bucket, n_bytes,
        CAST(off // 65536 AS BIGINT) AS shard_idx,
        CAST(off % 65536 AS BIGINT) AS byte_offset
      FROM o
    ),
    checked AS (
      SELECT shard_bucket, shard_idx, doc_id, n_bytes, byte_offset,
        LAG(byte_offset + n_bytes) OVER (
          PARTITION BY shard_bucket, shard_idx ORDER BY doc_id) AS prev_end,
        LEAD(doc_id) OVER (
          PARTITION BY shard_bucket, shard_idx ORDER BY doc_id) AS next_doc
      FROM plan
    )
    SELECT shard_bucket, shard_idx,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      bool_and(CASE WHEN prev_end IS NULL THEN byte_offset = 0
                    ELSE byte_offset = prev_end END) AS contiguous,
      bool_and(next_doc IS NULL OR byte_offset + n_bytes <= 65536)
        AS only_tail_overruns
    FROM checked
    GROUP BY shard_bucket, shard_idx
    ORDER BY shard_bucket, shard_idx
    """,
)
def m07_shard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _staged_payloads(spark, sf_dir)
    plan = M.plan_shards(
        staged, id_col="doc_id", bytes_col="payload", shard_budget=1 << 16
    )
    w = Window.partitionBy("shard_bucket", "shard_idx").orderBy("doc_id")
    checked = plan.select(
        "shard_bucket",
        "shard_idx",
        "doc_id",
        "n_bytes",
        "byte_offset",
        F.lag(F.col("byte_offset") + F.col("n_bytes")).over(w).alias("prev_end"),
        F.lead("doc_id").over(w).alias("next_doc"),
    )
    return (
        checked.groupBy("shard_bucket", "shard_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.bool_and(
                F.when(
                    F.col("prev_end").isNull(), F.col("byte_offset") == 0
                ).otherwise(F.col("byte_offset") == F.col("prev_end"))
            ).alias("contiguous"),
            F.bool_and(
                F.col("next_doc").isNull()
                | (F.col("byte_offset") + F.col("n_bytes") <= (1 << 16))
            ).alias("only_tail_overruns"),
        )
        .orderBy("shard_bucket", "shard_idx")
    )


# ---------------------------------------------------------------------------
# m08 — modality-interleaved sequence packing: the multimodal-training
# counterpart of t17. Per staged document, the training-sample length
# is text tokens + media tokens (a deterministic patch proxy:
# ceil(payload bytes / 64), capped at 256 — ViT-style patch budgets
# are a fixed function of media size) + 2 separator tokens; samples
# then concatenation-pack into 2048-token sequences PER MODALITY LANE
# (format = jpeg/png/wav — vision and audio batches pack separately,
# as multimodal trainers do). Same operator as t17
# (operators/packing.py::pack_offsets): exclusive prefix sum + integer
# div/mod per lane, no global window, all integer arithmetic — the
# oracle replays it exactly.
# ---------------------------------------------------------------------------
@register(
    "m08_multimodal_packing",
    oracle="""
    WITH staged AS (
      SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END
          AS format,
        octet_length(
          (CASE doc_id % 3 WHEN 0 THEN unhex('FFD8FF')
                           WHEN 1 THEN unhex('89504E47')
                           ELSE unhex('52494646') END
           || encode(text))) AS n_bytes,
        len(string_split(text, ' ')) AS n_text
      FROM documents
    ),
    sized AS (
      SELECT doc_id, format,
        CAST(n_text AS BIGINT) AS n_text_tokens,
        CAST(LEAST((n_bytes + 63) // 64, 256) AS BIGINT) AS n_media_tokens,
        CAST(n_text + LEAST((n_bytes + 63) // 64, 256) + 2 AS BIGINT) AS n
      FROM staged
    ),
    o AS (
      SELECT *, CAST(COALESCE(SUM(n) OVER (
          PARTITION BY format ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
      FROM sized
    )
    SELECT doc_id, format, n_text_tokens, n_media_tokens,
      n AS n_total_tokens,
      s // 2048 AS pack_first,
      (s + GREATEST(n, 1) - 1) // 2048 AS pack_last,
      s % 2048 AS pack_offset,
      ((s + GREATEST(n, 1) - 1) // 2048) - (s // 2048) + 1 AS n_packs
    FROM o ORDER BY doc_id
    """,
)
def m08_multimodal_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.functions import text as T
    from censo_escolar_spark.operators.packing import pack_offsets

    staged = _staged_payloads(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "jpeg")
        .when(F.col("doc_id") % 3 == 1, "png")
        .otherwise("wav")
    )
    n_text = T.token_count("text").cast("bigint")
    n_media = F.least(
        F.floor((F.octet_length("payload") + 63) / 64), F.lit(256)
    ).cast("bigint")
    sized = (
        staged.join(docs, "doc_id")
        .select(
            "doc_id",
            fmt.alias("format"),
            n_text.alias("n_text_tokens"),
            n_media.alias("n_media_tokens"),
            (n_text + n_media + 2).alias("n_total_tokens"),
        )
    )
    return pack_offsets(
        sized,
        "doc_id",
        "n_total_tokens",
        capacity=2048,
        stream_cols=["format"],
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# m09 — perceptual image hash (pHash): decoded 8×8 thumbnails → sign
# bits of the 63 non-DC integer-scaled DCT-II coefficients packed into
# one BIGINT. The oracle replays the splitmix64 pixel stream (m02's
# chain) and the SAME fixed integer DCT basis in SQL — coefficients are
# exact BIGINT sums, so the hash compares bit for bit. A float DCT
# would be fold-order-dependent and unhashable (the s07 lesson).
# ---------------------------------------------------------------------------
_DCT_VALUES = ", ".join(
    f"({u}, {x}, {t})" for u, row in enumerate(M.DCT8) for x, t in enumerate(row)
)
_M09_ORACLE = f"""
WITH {_fake_pix_ctes(_M02_STAGED, _M02_FIRST_BYTE)},
dct(u, x, t) AS (SELECT * FROM (VALUES {_DCT_VALUES})),
coef AS (
  SELECT p.doc_id, tu.u AS u, tv.u AS v, SUM(p.px * tu.t * tv.t) AS c
  FROM pix p
  JOIN dct tu ON tu.x = (p.i - 1) % 8
  JOIN dct tv ON tv.x = (p.i - 1) // 8
  GROUP BY 1, 2, 3
)
SELECT doc_id,
  CAST(SUM(CASE WHEN c > 0
                THEN (1::BIGINT << CAST(u * 8 + v - 1 AS INTEGER))
                ELSE 0 END) AS BIGINT) AS phash
FROM coef
WHERE NOT (u = 0 AND v = 0)
GROUP BY doc_id
ORDER BY doc_id
"""


@register("m09_perceptual_hash", oracle=_M09_ORACLE)
def m09_perceptual_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image pHash over the staged corpus: Arrow decode (fake
    decoder = the oracle-replayable path), then the exact-integer DCT
    sign-bit pack (operators/multimodal.phash64) entirely JVM-side."""
    staged = _staged_payloads(spark, sf_dir)
    decoded = M.decode_media(staged, bytes_col="payload", decoder=M.fake_decode)
    return (
        M.phash64(decoded)
        .select(F.col("id").alias("doc_id"), "phash")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# m10 — perceptual near-dup image pairs: pHash + pigeonhole Hamming-band
# join (4×16-bit bands, exact recall for hamming ≤ 3), exact bit_count
# verification. Payloads are staged into 40 deterministic duplicate
# classes (doc_id % 40 → identical bytes) so the fixture has real
# dup cliques; the avalanche fake decoder makes non-identical payloads
# uncorrelated, so the expected pairs are exactly the classes — but the
# oracle derives them the honest way: replay pixels → DCT hashes →
# all-pairs bit_count(xor) ≤ 3 (DuckDB's quadratic join is fine at
# oracle scale; the Spark side is the banded sub-quadratic plan).
# ---------------------------------------------------------------------------
_M10_STAGED = """
  SELECT doc_id,
    (unhex('89504E47') || encode(CAST(doc_id % 40 AS VARCHAR))) AS payload
  FROM documents
"""
_M10_ORACLE = f"""
WITH {_fake_pix_ctes(_M10_STAGED, "137")},
dct(u, x, t) AS (SELECT * FROM (VALUES {_DCT_VALUES})),
coef AS (
  SELECT p.doc_id, tu.u AS u, tv.u AS v, SUM(p.px * tu.t * tv.t) AS c
  FROM pix p
  JOIN dct tu ON tu.x = (p.i - 1) % 8
  JOIN dct tv ON tv.x = (p.i - 1) // 8
  GROUP BY 1, 2, 3
),
ph AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN c > 0
                  THEN (1::BIGINT << CAST(u * 8 + v - 1 AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS phash
  FROM coef
  WHERE NOT (u = 0 AND v = 0)
  GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
ORDER BY id_a, id_b
"""


@register("m10_phash_near_dup_pairs", oracle=_M10_ORACLE)
def m10_phash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit("89504E47")),
            F.encode((F.col("doc_id") % 40).cast("string"), "utf-8"),
        ).alias("payload"),
    )
    decoded = M.decode_media(staged, bytes_col="payload", decoder=M.fake_decode)
    # the band self-join scans the hashes twice; without an eager cut
    # the Arrow decode + DCT pipeline would run once per scan
    hashes = M.phash64(decoded).localCheckpoint(eager=True)
    return (
        M.phash_pairs(hashes, "id", max_hamming=3)
        .select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            "hamming",
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# m11 — perceptual near-dup image CLUSTERS: m10's pair graph closed into
# per-image cluster labels + a canonical keep flag (the d06/d07 shape,
# reusing operators/dedup.clusters_from_pairs). This is the scale-safe
# CONSUMER contract for image dedup: a 100-TB pipeline reads O(images)
# labels, never the O(clique²) pair list — m10's pair output is
# inherently quadratic in clique size by contract, so cluster labels are
# what downstream keep/drop joins should consume. Same staged dup-class
# fixture as m10; the oracle replays pixels → DCT hashes → hamming ≤ 3
# pairs → recursive-CTE transitive closure (the d07 pattern).
# ---------------------------------------------------------------------------
_M11_ORACLE = f"""
WITH RECURSIVE {_fake_pix_ctes(_M10_STAGED, "137")},
dct(u, x, t) AS (SELECT * FROM (VALUES {_DCT_VALUES})),
coef AS (
  SELECT p.doc_id, tu.u AS u, tv.u AS v, SUM(p.px * tu.t * tv.t) AS c
  FROM pix p
  JOIN dct tu ON tu.x = (p.i - 1) % 8
  JOIN dct tv ON tv.x = (p.i - 1) // 8
  GROUP BY 1, 2, 3
),
ph AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN c > 0
                  THEN (1::BIGINT << CAST(u * 8 + v - 1 AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS phash
  FROM coef
  WHERE NOT (u = 0 AND v = 0)
  GROUP BY doc_id
),
pairs AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 3
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
  FROM reach GROUP BY src
)
SELECT h.doc_id,
  CAST(COALESCE(c.cluster_id, h.doc_id) AS BIGINT) AS cluster_id,
  COALESCE(c.cluster_id, h.doc_id) = h.doc_id AS keep
FROM ph h LEFT JOIN comp c USING (doc_id)
ORDER BY doc_id
"""


@register("m11_phash_dedup_clusters", oracle=_M11_ORACLE)
def m11_phash_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit("89504E47")),
            F.encode((F.col("doc_id") % 40).cast("string"), "utf-8"),
        ).alias("payload"),
    )
    decoded = M.decode_media(staged, bytes_col="payload", decoder=M.fake_decode)
    # value pairs + label rejoin both consume the hashes; one eager cut
    # stops the Arrow decode + DCT pipeline re-running
    hashes = M.phash64(decoded).localCheckpoint(eager=True)
    # closure runs on the CONTRACTED value graph (phash_clusters), never
    # the record-pair graph — the record formulation was output-quadratic
    # in clique size (63x at the 10x probe)
    labeled = M.phash_clusters(hashes, "id", max_hamming=3)
    return (
        labeled.select(
            F.col("id").cast("bigint").alias("doc_id"),
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "keep",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# m12 — streaming image-corpus dedup parity: the image-modality d19.
# The staged dup-class images arrive as three micro-batches (doc_id % 3
# — arbitrary arrival slicing), each pushed through the streaming
# maintainer's foreachBatch body (streaming/imagededup.py): decode →
# pHash ONCE, probe the STORED hash index at the value level, drop
# near-dups of published images, cluster batch survivors on the
# contracted value graph, publish cluster winners. The oracle replays
# the same increments honestly: pixels → DCT hashes → hamming ≤ 3
# record pairs → the 3-step unrolled drop-then-cluster (recursive-CTE
# closures per batch, the d19 scaffolding). Drop-then-cluster is the
# operator's documented semantics — increments never retroactively
# delete published images.
# ---------------------------------------------------------------------------
_M12_ORACLE = f"""
WITH RECURSIVE {_fake_pix_ctes(_M10_STAGED, "137")},
dct(u, x, t) AS (SELECT * FROM (VALUES {_DCT_VALUES})),
coef AS (
  SELECT p.doc_id, tu.u AS u, tv.u AS v, SUM(p.px * tu.t * tv.t) AS c
  FROM pix p
  JOIN dct tu ON tu.x = (p.i - 1) % 8
  JOIN dct tv ON tv.x = (p.i - 1) // 8
  GROUP BY 1, 2, 3
),
ph AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN c > 0
                  THEN (1::BIGINT << CAST(u * 8 + v - 1 AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS phash
  FROM coef
  WHERE NOT (u = 0 AND v = 0)
  GROUP BY doc_id
),
pairs AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 3
),
e0 AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  WHERE id_a % 3 = 0 AND id_b % 3 = 0
  UNION
  SELECT id_b, id_a FROM pairs WHERE id_a % 3 = 0 AND id_b % 3 = 0
),
r0(src, dst) AS (
  SELECT src, dst FROM e0
  UNION
  SELECT r.src, e.dst FROM r0 r JOIN e0 e ON r.dst = e.src
),
c0 AS MATERIALIZED (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cl FROM r0 GROUP BY src),
k0 AS MATERIALIZED (
  SELECT d.doc_id
  FROM (SELECT doc_id FROM ph WHERE doc_id % 3 = 0) d
  LEFT JOIN c0 USING (doc_id)
  WHERE d.doc_id = COALESCE(c0.cl, d.doc_id)
),
hx1 AS MATERIALIZED (
  SELECT DISTINCT CASE WHEN id_a % 3 = 1 THEN id_a ELSE id_b END AS doc_id
  FROM pairs
  WHERE (id_a % 3 = 1 AND id_b IN (SELECT doc_id FROM k0))
     OR (id_b % 3 = 1 AND id_a IN (SELECT doc_id FROM k0))
),
s1 AS MATERIALIZED (
  SELECT doc_id FROM ph
  WHERE doc_id % 3 = 1 AND doc_id NOT IN (SELECT doc_id FROM hx1)
),
e1 AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  WHERE id_a IN (SELECT doc_id FROM s1) AND id_b IN (SELECT doc_id FROM s1)
  UNION
  SELECT id_b, id_a FROM pairs
  WHERE id_a IN (SELECT doc_id FROM s1) AND id_b IN (SELECT doc_id FROM s1)
),
r1(src, dst) AS (
  SELECT src, dst FROM e1
  UNION
  SELECT r.src, e.dst FROM r1 r JOIN e1 e ON r.dst = e.src
),
c1 AS MATERIALIZED (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cl FROM r1 GROUP BY src),
k1 AS MATERIALIZED (
  SELECT s1.doc_id FROM s1
  LEFT JOIN c1 USING (doc_id)
  WHERE s1.doc_id = COALESCE(c1.cl, s1.doc_id)
),
pub2 AS MATERIALIZED (SELECT doc_id FROM k0 UNION ALL SELECT doc_id FROM k1),
hx2 AS MATERIALIZED (
  SELECT DISTINCT CASE WHEN id_a % 3 = 2 THEN id_a ELSE id_b END AS doc_id
  FROM pairs
  WHERE (id_a % 3 = 2 AND id_b IN (SELECT doc_id FROM pub2))
     OR (id_b % 3 = 2 AND id_a IN (SELECT doc_id FROM pub2))
),
s2 AS MATERIALIZED (
  SELECT doc_id FROM ph
  WHERE doc_id % 3 = 2 AND doc_id NOT IN (SELECT doc_id FROM hx2)
),
e2 AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  WHERE id_a IN (SELECT doc_id FROM s2) AND id_b IN (SELECT doc_id FROM s2)
  UNION
  SELECT id_b, id_a FROM pairs
  WHERE id_a IN (SELECT doc_id FROM s2) AND id_b IN (SELECT doc_id FROM s2)
),
r2(src, dst) AS (
  SELECT src, dst FROM e2
  UNION
  SELECT r.src, e.dst FROM r2 r JOIN e2 e ON r.dst = e.src
),
c2 AS MATERIALIZED (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cl FROM r2 GROUP BY src),
k2 AS MATERIALIZED (
  SELECT s2.doc_id FROM s2
  LEFT JOIN c2 USING (doc_id)
  WHERE s2.doc_id = COALESCE(c2.cl, s2.doc_id)
)
SELECT doc_id, CAST(doc_id % 3 + 1 AS INTEGER) AS batch
FROM (
  SELECT doc_id FROM k0
  UNION ALL SELECT doc_id FROM k1
  UNION ALL SELECT doc_id FROM k2
)
ORDER BY doc_id
"""


@register("m12_streaming_image_dedup_parity", oracle=_M12_ORACLE)
def m12_streaming_image_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Store construction: the three %3 increments through the
    # maintainer's batch body, built once as the process-shared fixture
    # (plans/fixtures.image_store_base; m15/m16 rebase on it). This row
    # reads the published live index.
    from censo_escolar_spark.plans.fixtures import image_store_base
    from censo_escolar_spark.streaming import detach
    from censo_escolar_spark.streaming.imagededup import read_published_hashes

    store = image_store_base(spark, sf_dir)
    final = read_published_hashes(spark, store)
    out = final.select(
        "doc_id", (F.col("doc_id") % 3 + 1).cast("int").alias("batch")
    ).orderBy("doc_id")
    return detach(out)


# ---------------------------------------------------------------------------
# m13 — cross-modal conflict pair mining: the retrieval step the
# multimodal lane lacked. Join the image pHash-dup cluster labels (the
# m11 pipeline) against the caption near-dup cluster labels (the d06
# pipeline) and mine the HARD training pairs both ways:
# image-duplicated-but-caption-distinct (same pHash cluster, different
# caption clusters — the captions carry the signal) and
# caption-duplicated-but-image-distinct (near-identical captions on
# visually distinct images). Pure label algebra, O(rows): one groupBy
# per direction on the (dup_cluster, other_cluster) pair + an anchor
# join (operators/dedup.label_conflict_pairs) — one pair per
# disagreeing group, never the within-cluster quadratic pair list. The
# oracle replays BOTH label pipelines honestly (the d06 Jaccard closure
# and the m11 pixels→DCT→hamming closure as scoped recursive
# subqueries) and restates the mining as plain SQL label joins.
# ---------------------------------------------------------------------------
def _m13_oracle() -> str:
    from censo_escolar_spark.plans.northstar import _D06_ORACLE

    # guard the textual surgery: the composition strips the donors'
    # FINAL top-level ORDER BY, which is only safe while that clause is
    # literally the last thing in each donor — fail at import time (not
    # with silently-mangled SQL) if a donor's tail ever changes
    for donor in (_D06_ORACLE, _M11_ORACLE):
        assert donor.rstrip().endswith("ORDER BY doc_id"), (
            "m13 oracle composition expects the donor oracle to end with"
            " its top-level ORDER BY"
        )
    cap_labels = _D06_ORACLE.rsplit("ORDER BY", 1)[0]
    img_labels = _M11_ORACLE.rsplit("ORDER BY", 1)[0]
    return f"""
    WITH cap AS (
      SELECT doc_id, cluster_id AS cap_cluster FROM ({cap_labels})
    ),
    img AS (
      SELECT doc_id, cluster_id AS img_cluster FROM ({img_labels})
    ),
    labels AS (
      SELECT i.doc_id, i.img_cluster, c.cap_cluster
      FROM img i JOIN cap c USING (doc_id)
    ),
    ia AS (
      SELECT img_cluster, cap_cluster AS anchor_other
      FROM labels WHERE doc_id = img_cluster
    ),
    ig AS (
      SELECT img_cluster, cap_cluster, MIN(doc_id) AS candidate_id
      FROM labels GROUP BY 1, 2
    ),
    ca AS (
      SELECT cap_cluster, img_cluster AS anchor_other
      FROM labels WHERE doc_id = cap_cluster
    ),
    cg AS (
      SELECT cap_cluster, img_cluster, MIN(doc_id) AS candidate_id
      FROM labels GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT 'image_dup_caption_distinct' AS pair_type,
        CAST(g.img_cluster AS BIGINT) AS anchor_id,
        CAST(g.candidate_id AS BIGINT) AS candidate_id
      FROM ig g JOIN ia a USING (img_cluster)
      WHERE g.cap_cluster != a.anchor_other
      UNION ALL
      SELECT 'caption_dup_image_distinct' AS pair_type,
        CAST(g.cap_cluster AS BIGINT) AS anchor_id,
        CAST(g.candidate_id AS BIGINT) AS candidate_id
      FROM cg g JOIN ca a USING (cap_cluster)
      WHERE g.img_cluster != a.anchor_other
    )
    ORDER BY pair_type, anchor_id, candidate_id
    """


@register("m13_cross_modal_conflicts", oracle=_m13_oracle())
def m13_cross_modal_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit("89504E47")),
            F.encode((F.col("doc_id") % 40).cast("string"), "utf-8"),
        ).alias("payload"),
    )
    # the image-label and caption-label pipelines are INDEPENDENT until
    # the doc_id join, and each runs several eager driver actions
    # internally (checkpoint cuts, the closure's convergence probes), so
    # composing them sequentially leaves the executors idle during every
    # other pipeline's single-task tails. Build them from two driver
    # threads instead — optimization guide §2.6: actions are only
    # sequential because the driver calls them sequentially; FIFO
    # scheduling back-fills one pipeline's stragglers with the other's
    # jobs. Results are plain (doc_id, label) frames; no session conf is
    # touched on either path, so the threads share the session safely.
    from concurrent.futures import ThreadPoolExecutor

    def img_labels() -> DataFrame:
        decoded = M.decode_media(staged, bytes_col="payload", decoder=M.fake_decode)
        hashes = M.phash64(decoded).localCheckpoint(eager=True)
        return M.phash_clusters(hashes, "id", max_hamming=3).select(
            F.col("id").cast("bigint").alias("doc_id"),
            F.col("cluster_id").cast("bigint").alias("img_cluster"),
        )

    def cap_labels() -> DataFrame:
        return dedup.dedup_clusters(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).select("doc_id", F.col("cluster_id").alias("cap_cluster"))

    with ThreadPoolExecutor(max_workers=2) as pool:
        img_f, cap_f = pool.submit(img_labels), pool.submit(cap_labels)
        img, cap = img_f.result(), cap_f.result()
    # both mining directions consume the joined labels; one eager cut
    # stops the two label pipelines re-running per direction
    labels = img.join(cap, "doc_id").localCheckpoint(eager=True)
    a = dedup.label_conflict_pairs(
        labels,
        id_col="doc_id",
        dup_col="img_cluster",
        distinct_col="cap_cluster",
        pair_type="image_dup_caption_distinct",
    )
    b = dedup.label_conflict_pairs(
        labels,
        id_col="doc_id",
        dup_col="cap_cluster",
        distinct_col="img_cluster",
        pair_type="caption_dup_image_distinct",
    )
    return a.unionByName(b).orderBy("pair_type", "anchor_id", "candidate_id")


# ---------------------------------------------------------------------------
# m14 — QC-GATED image ingest: the d24 composition on the image lane.
# A deterministic image-quality gate (mean brightness — SUM(pixels)
# over the 8×8 thumbnail >= 8192, i.e. mean >= 128; the m02 decode
# stats made an admission predicate) runs INSIDE the maintainer's
# per-batch body right after the single decode, so rejected images
# never cost DCT hashing, band joins, or index writes — and, unlike a
# pre-filter in front of the stream, shares the batch's one decode.
# The uniform splitmix64 fake pixels put per-image mean brightness
# tightly around 127.5, so the >= 128 cut genuinely splits the 40
# payload classes (≈half admitted — the boundary is exercised, not
# vacuous). Oracle: m12's three-increment drop-then-cluster replay
# with every hash-table read rebound to the GATED hash set (the gate
# is exact integer arithmetic on the same pix CTE both engines
# derive from the payload bytes).
# ---------------------------------------------------------------------------
def _m14_oracle() -> str:
    # textual surgery like d24's: gate CTEs slot in after `ph`, and
    # every DOWNSTREAM read of the hash table rebinds to the gated
    # view. Guards keep the surgery honest if m12's oracle changes.
    marker = "pairs AS MATERIALIZED ("
    assert _M12_ORACLE.count(marker) == 1, "m14 surgery: marker not unique"
    head, tail = _M12_ORACLE.split(marker, 1)
    import re

    tail = re.sub(r"\bph\b", "phg", marker + tail)
    assert re.search(r"\bph\b", tail) is None
    gate = """qc AS MATERIALIZED (
  SELECT doc_id FROM pix GROUP BY doc_id HAVING SUM(px) >= 8192
),
phg AS MATERIALIZED (
  SELECT ph.doc_id, ph.phash FROM ph JOIN qc USING (doc_id)
),
"""
    return head + gate + tail


@register("m14_gated_image_ingest", oracle=_m14_oracle())
def m14_gated_image_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from censo_escolar_spark.plans.fixtures import (
        PARITY_SHUFFLE,
        gated_image_base,
        image_qc_gate,
    )
    from censo_escolar_spark.streaming import (
        clone_state,
        detach_from_state,
        state_shuffle,
    )
    from censo_escolar_spark.streaming.imagededup import (
        apply_image_dedup_batch,
        read_published_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit("89504E47")),
            F.encode((F.col("doc_id") % 40).cast("string"), "utf-8"),
        ).alias("payload"),
    )
    # gated batches 1-2 come from the shared family base (the d24
    # pattern on the image lane); the third gated increment + published
    # read run live on a private clone. The gate — a mean-brightness
    # admission, an exact integer fold over the decoded 8x8 thumbnail
    # (codegen; the decode itself is the batch's one Arrow crossing) —
    # is the same expression the base builder applied.
    gate = image_qc_gate()
    state = clone_state(
        gated_image_base(spark, sf_dir), prefix="m14_gated_state_"
    )
    try:
        with state_shuffle(spark, PARITY_SHUFFLE):
            apply_image_dedup_batch(
                staged.filter(F.col("doc_id") % 3 == 2),
                3,
                state_dir=state,
                decoder=M.fake_decode,
                qc_gate=gate,
            )
            final = read_published_hashes(spark, state)
            out = final.select(
                "doc_id", (F.col("doc_id") % 3 + 1).cast("int").alias("batch")
            ).orderBy("doc_id")
            return detach_from_state(out, state)
    finally:
        shutil.rmtree(state, ignore_errors=True)


# ---------------------------------------------------------------------------
# m15 — image-store RIGHT-TO-BE-FORGOTTEN: the d22 tombstone discipline
# on the pHash image store, where it matters most. The m12 chain gains
# a delete wave (tombstones for doc_id %5==0, bid 4 — its cadence fold
# at upto=3 runs pre-delete) and then a FULL RE-INGEST wave of every
# staged image under offset ids (bid 6): each copy is an exact byte
# duplicate of its original, so it publishes iff NO live published
# hash is within hamming 3 — i.e. exactly the classes whose published
# representatives were all forgotten re-publish, proving a forgotten
# image stops suppressing future near-dups. Bid 6's cadence fold
# (upto=5) is the DELETE-AWARE reclaim: tombstoned (doc_id, phash)
# rows leave the store's files and the consumed tombstones drop.
# Oracle: m12's replay extended with the live-view subtraction and one
# more drop-then-cluster round over the re-ingest wave.
# Non-vacuity at sf0.001+ is asserted in
# tests/test_oracle_parity.py::test_m15_construction_nonvacuous.
# ---------------------------------------------------------------------------
def _m15_ctes() -> str:
    """m12's CTE scaffolding + the delete-wave rounds (shared by the
    m15 and m16 oracles). Guards keep the surgery honest if m12's
    oracle changes."""
    marker = "SELECT doc_id, CAST(doc_id % 3 + 1 AS INTEGER) AS batch"
    assert _M12_ORACLE.count(marker) == 1, "m15 surgery: marker not unique"
    head = _M12_ORACLE.rsplit(marker, 1)[0]
    return (
        head.rstrip().rstrip(")").rstrip()
        + """
),
live3 AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT doc_id FROM k0
    UNION ALL SELECT doc_id FROM k1
    UNION ALL SELECT doc_id FROM k2
  ) WHERE doc_id % 5 <> 0
),
hx6 AS MATERIALIZED (
  SELECT p.id_a AS doc_id FROM pairs p JOIN live3 l ON p.id_b = l.doc_id
  UNION
  SELECT p.id_b FROM pairs p JOIN live3 l ON p.id_a = l.doc_id
  UNION
  SELECT doc_id FROM live3
),
s6 AS MATERIALIZED (
  SELECT doc_id FROM ph WHERE doc_id NOT IN (SELECT doc_id FROM hx6)
),
e6 AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  WHERE id_a IN (SELECT doc_id FROM s6) AND id_b IN (SELECT doc_id FROM s6)
  UNION
  SELECT id_b, id_a FROM pairs
  WHERE id_a IN (SELECT doc_id FROM s6) AND id_b IN (SELECT doc_id FROM s6)
),
r6(src, dst) AS (
  SELECT src, dst FROM e6
  UNION
  SELECT r.src, e.dst FROM r6 r JOIN e6 e ON r.dst = e.src
),
c6 AS MATERIALIZED (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cl FROM r6 GROUP BY src
),
k6 AS MATERIALIZED (
  SELECT s6.doc_id FROM s6
  LEFT JOIN c6 USING (doc_id)
  WHERE s6.doc_id = COALESCE(c6.cl, s6.doc_id)
)
"""
    )


#: doc_id offset of the re-ingest wave — plans/fixtures.py
#: IMAGE_REINGEST_OFFSET (1 << 40), embedded literally in the SQL.
_M15_OFFSET_SQL = "1099511627776"


def _m15_oracle() -> str:
    return (
        _m15_ctes()
        + f"""
SELECT doc_id, CAST(batch AS INTEGER) AS batch
FROM (
  SELECT doc_id, doc_id % 3 + 1 AS batch FROM live3
  UNION ALL SELECT doc_id + {_M15_OFFSET_SQL}, 6 FROM k6
)
ORDER BY doc_id
"""
    )


@register("m15_image_forget", oracle=_m15_oracle())
def m15_image_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.plans.fixtures import (
        IMAGE_REINGEST_OFFSET,
        image_deletes_store,
    )
    from censo_escolar_spark.streaming import detach
    from censo_escolar_spark.streaming.imagededup import read_published_hashes

    store = image_deletes_store(spark, sf_dir)
    final = read_published_hashes(spark, store)
    out = final.select(
        "doc_id",
        F.when(F.col("doc_id") >= IMAGE_REINGEST_OFFSET, F.lit(6))
        .otherwise(F.col("doc_id") % 3 + 1)
        .cast("int")
        .alias("batch"),
    ).orderBy("doc_id")
    return detach(out)


# ---------------------------------------------------------------------------
# m16 — SNAPSHOT (time-travel) reads of the image store: the d25/t44/
# s29/q75 audit on the FIFTH store family, completing time travel
# across every versioned store. Horizons must sit at-or-above fold
# boundaries (folds collapse strictly-below history): snapshot 1 reads
# the BASE store mid-history (below=3: the first two increments);
# snapshot 2 reads the deletes store at below=6, which resolves the
# post-delete pre-re-ingest state THROUGH the reclaiming fold's
# batch=5 partition (the folded file IS the snapshot — tombstones
# consumed); snapshot 3 is the live view. A ⊉ relationships hold by
# construction: 2 ⊂ 1's future (delete shrank it), 3 ⊃ 2 (re-ingest).
# ---------------------------------------------------------------------------
def _m16_oracle() -> str:
    return (
        _m15_ctes()
        + f"""
SELECT CAST(snapshot AS INTEGER) AS snapshot, doc_id,
  CAST(batch AS INTEGER) AS batch
FROM (
  SELECT 1 AS snapshot, doc_id, doc_id % 3 + 1 AS batch FROM k0
  UNION ALL SELECT 1, doc_id, doc_id % 3 + 1 FROM k1
  UNION ALL SELECT 2, doc_id, doc_id % 3 + 1 FROM live3
  UNION ALL SELECT 3, doc_id, doc_id % 3 + 1 FROM live3
  UNION ALL SELECT 3, doc_id + {_M15_OFFSET_SQL}, 6 FROM k6
)
ORDER BY snapshot, doc_id
"""
    )


@register("m16_image_snapshot_read", oracle=_m16_oracle())
def m16_image_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from censo_escolar_spark.plans.fixtures import (
        IMAGE_REINGEST_OFFSET,
        image_deletes_store,
        image_store_base,
    )
    from censo_escolar_spark.streaming import detach
    from censo_escolar_spark.streaming.imagededup import read_published_hashes

    base = image_store_base(spark, sf_dir)
    store = image_deletes_store(spark, sf_dir)

    def label():
        return (
            F.when(F.col("doc_id") >= IMAGE_REINGEST_OFFSET, F.lit(6))
            .otherwise(F.col("doc_id") % 3 + 1)
            .cast("int")
            .alias("batch")
        )

    def probe(snap: int, root: str, below) -> DataFrame:
        return read_published_hashes(spark, root, below=below).select(
            F.lit(snap).cast("int").alias("snapshot"), "doc_id", label()
        )

    out = (
        probe(1, base, 3)
        .unionByName(probe(2, store, 6))
        .unionByName(probe(3, store, None))
        .orderBy("snapshot", "doc_id")
    )
    return detach(out)
