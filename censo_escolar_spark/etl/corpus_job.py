"""End-to-end corpus curation job — the training-data counterpart of
``etl/job.py``'s census pipeline: one driver function chaining the
north-star operators into the pipeline a 100 TB pretraining corpus
actually runs, with a data-quality gate before the sink.

Stages (each a lazy DataFrame transformation until the single write):

1. ingest       — parquet corpus (or any frame with (id, text, lang))
2. clean        — boilerplate-line stripping (functions.text)
3. quality gate — closed-form keep/drop signals, pushed to the scan
4. near-dedup   — minhash-LSH corpus_dedup (shuffle O(docs × bands));
                  keep = deterministic canonical member per cluster
5. enrich       — language ID, token counts, quality stats columns
6. split        — content-hash train/val/test labels (no RNG)
7. audit        — expectations report (operators.quality); the job
                  REFUSES to write when a gating check fails
8. sink         — hive-partitioned snappy parquet by (split, lang)
                  with bounded file sizes + a job summary

Scale notes: stages 2-6 are one fused projection pipeline whose result
is materialized ONCE (eager localCheckpoint) so the audit gate, the
sink, and the summary never re-run curation; the only shuffles are the
dedup pair generation/closure and the final partitioned write. The
audit runs on the CURATED frame before the sink, so a bad upstream
batch can never publish (reference analogue: load happens only after
transform succeeds, censo_escolar.py DAG ordering).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from censo_escolar_spark.functions import text as T
from censo_escolar_spark.operators import quality as Q
from censo_escolar_spark.operators.dedup import corpus_dedup
from censo_escolar_spark.operators.skew import spread_small_input
from censo_escolar_spark.sources.writers import write_partitioned_parquet


@dataclass
class CorpusJobConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    lang_col: str = "lang"
    min_tokens: int = 10
    max_digit_ratio: float = 0.3
    min_avg_token_len: float = 2.0
    dedup_threshold: float = 0.5
    train_pct: int = 80
    val_pct: int = 10
    max_records_per_file: int = 2_000_000
    accepted_langs: list[str] = field(
        default_factory=lambda: ["en", "de", "fr", "es", "pt", "zh"]
    )


def curate(
    df: DataFrame, cfg: CorpusJobConfig, *, n_rows: int | None = None
) -> DataFrame:
    """Stages 2-6: clean → quality filter → dedup → enrich → split.

    EAGER contract: calling this triggers Spark jobs immediately (the
    cleaned frame is ``localCheckpoint(eager=True)``-materialized once
    because dedup and the keep-join both consume it), and the returned
    frame's lineage is tied to executor block storage for the session's
    lifetime. Callers composing plans lazily should call this at the
    point they are ready to materialize, exactly like ``run_corpus_job``
    does at its own boundary."""
    i, t = cfg.id_col, cfg.text_col
    # regex-heavy cleaning + quality signals are CPU-dense per byte:
    # spread a harness-small/unsplittable source across cores first
    # (guide §2.5 — the checkpoint below measured 2.3 s on ONE task);
    # no-op when the source already scans at core count (real corpora).
    # n_rows (optional, parquet-footer metadata from the caller) caps
    # the spread width scale-aware; see spread_small_input.
    df = spread_small_input(df, i, rows=n_rows)
    cleaned = df.withColumn(t, T.strip_boilerplate(t)).filter(
        T.quality_keep(
            t,
            min_tokens=cfg.min_tokens,
            max_digit_ratio=cfg.max_digit_ratio,
            min_avg_token_len=cfg.min_avg_token_len,
        )
    )
    # the cleaned frame feeds BOTH the dedup sketch pass and the
    # keep-join below; one eager cut stops the regex-heavy clean +
    # quality pipeline running twice (MEMORY_AND_DISK blocks — at real
    # scale this is the same materialize-once decision run_corpus_job
    # makes for the curated frame)
    cleaned = cleaned.localCheckpoint(eager=True)
    labels = corpus_dedup(cleaned, i, t, threshold=cfg.dedup_threshold).select(
        i, "cluster_id", "keep"
    )
    kept = cleaned.join(labels, i).filter(F.col("keep")).drop("keep")
    return kept.select(
        "*",
        T.token_count(t).cast("bigint").alias("n_tokens"),
        T.avg_token_len(t).alias("avg_token_len"),
        T.split_assign(t, train_pct=cfg.train_pct, val_pct=cfg.val_pct).alias("split"),
    )


def audit(curated: DataFrame, cfg: CorpusJobConfig) -> DataFrame:
    """Stage 7: the publish gate — every check must pass."""
    return Q.report(
        Q.row_checks(
            curated,
            [
                Q.null_check(cfg.text_col),
                Q.accepted_values(cfg.lang_col, cfg.accepted_langs),
                (f"{cfg.text_col}_min_tokens", F.col("n_tokens") < cfg.min_tokens),
                ("split_assigned", ~F.col("split").isin(["train", "val", "test"])),
            ],
        ),
        Q.unique_check(curated, [cfg.id_col], f"{cfg.id_col}_unique"),
    )


class CorpusAuditError(RuntimeError):
    """Raised when the publish gate fails; carries the failing checks."""

    def __init__(self, failures: list):
        self.failures = failures
        super().__init__(f"corpus audit failed: {failures}")


def run_corpus_job(
    spark: SparkSession,
    source: DataFrame | str,
    out_dir: str,
    *,
    config: CorpusJobConfig | None = None,
) -> dict:
    """Run the full curation pipeline; returns the job summary.

    ``source`` is a DataFrame or a parquet path. Raises
    ``CorpusAuditError`` (and writes NOTHING) if any audit check fails.
    """
    cfg = config or CorpusJobConfig()
    df = spark.read.parquet(source) if isinstance(source, str) else source
    # ONE curation pass: the audit gate, the sink, and the split summary
    # all read the eagerly-materialized result — without this the full
    # clean→dedup→enrich pipeline re-runs per consumer (and at real
    # scale the corpus is re-read between gate and publish)
    curated = curate(df, cfg).localCheckpoint(eager=True)
    rep = audit(curated, cfg).collect()
    failures = [(r.check, r.violations) for r in rep if not r.ok]
    if failures:
        raise CorpusAuditError(failures)
    write_partitioned_parquet(
        curated,
        out_dir,
        ["split", cfg.lang_col],
        mode="overwrite",
        max_records_per_file=cfg.max_records_per_file,
    )
    split_counts = {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # curated row count comes from the audit's own totals — pulled from a
    # NAMED row-level check over the curated frame (its total is the
    # curated row count by construction), never positionally: a report
    # reorder or a future check with a different total basis must not
    # silently corrupt the summary
    curated_rows = next(
        r.total for r in rep if r.check == f"{cfg.text_col}_min_tokens"
    )
    return {
        "input_rows": df.count(),
        "curated_rows": curated_rows,
        "split_counts": split_counts,
        "audit": {r.check: r.violations for r in rep},
        "out_dir": out_dir,
    }
