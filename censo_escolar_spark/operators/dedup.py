"""Deduplication operators for large-scale document corpora.

Four strategies, all UDF-free:

1. **Exact** — group on a normalized fingerprint, keep the min-id
   representative. One shuffle on the fingerprint; AQE handles skew.
2. **N-gram Jaccard** — exact near-dup pairs via shingle inverted-index
   self-join. Correct but candidate generation is O(Σ f(s)²) over shingle
   frequencies; the scale path is minhash below. Hot shingles should be
   stop-listed at 100 TB (df cut), documented here rather than silently.
3. **MinHash + LSH** — narrow per-doc signature (64 hashes via
   xxhash64(i, shingle), no shuffle), banded into (band_idx, band_hash)
   keys; candidates = equi-join on bands; exact Jaccard verification on
   the candidate set only. This is the 100 TB design: shuffle volume is
   O(docs × bands), never O(docs²).
4. **SimHash** — 60-bit fingerprints (functions.text.simhash), hamming-
   banded for candidate generation by pigeonhole.

Embedding-cosine near-dup lives in operators/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StructField, StructType

from censo_escolar_spark.functions.hashing import splitmix64
from censo_escolar_spark.functions.text import (
    fingerprint_md5,
    hamming60,
    shingles,
    simhash_bands,
    token_hash60,
    tokens,
)

MINHASH_K = 64  # signature length
MINHASH_BANDS = 32  # 32 bands × 2 rows: P(miss | J=0.5) ≈ (1-0.25)^32 ≈ 1e-4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint; keeps min-id winner.

    Equivalent to ``dropDuplicates`` but with a *deterministic*
    representative (dropDuplicates keeps an arbitrary row — unacceptable
    for reproducible corpus builds).
    """
    return (
        df.withColumn("__fp", fingerprint_md5(text_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("__fp")
    )


def _token_windows(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """One row per n-token window: (id, pos, __w struct of the n tokens).

    The single shared window scaffold for shingle/span operators, built
    WITHOUT interpreted lambdas (~1 µs/element): n aligned ``slice``s
    zipped with ``arrays_zip`` (codegen), then ``posexplode``. Documents
    shorter than n tokens produce no rows. Consumers project the struct
    with ``_window_hash(n)`` (8-byte join key) or ``concat_ws`` (readable
    n-gram) — both codegen, applied AFTER the explode."""
    base = df.select(F.col(id_col), tokens(text_col).alias("__toks")).filter(
        F.size("__toks") >= n
    )
    m = F.size(F.col("__toks")) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice("__toks", F.lit(i + 1), m).alias(f"t{i}") for i in range(n)]
    )
    return base.select(F.col(id_col), F.posexplode(zipped).alias("pos", "__w"))


def _window_hash(n: int) -> Column:
    """xxhash64 over the n fields of a ``_token_windows`` struct."""
    return F.xxhash64(*[F.col(f"__w.t{i}") for i in range(n)])


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle-hash) pairs, distinct — the inverted-index input.

    The index carries an 8-byte hash of the n-token window instead of
    the ~20-char shingle string: the self-join shuffles 2-3× fewer bytes
    and compares longs. Set sizes/intersections are unchanged absent a
    collision between two distinct shingles of the same document pair
    (P ≈ |sh|²/2⁶⁵ — vanishing).

    Lambda-free on purpose: see ``_token_windows``."""
    return (
        _token_windows(df, id_col, text_col, n)
        .select(F.col(id_col), _window_hash(n).alias("shingle"))
        .distinct()
    )


def shingle_strings(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle-STRING) pairs, distinct per document — for corpus
    statistics that need readable n-grams (frequency tables, reports),
    unlike the hashed ``shingle_sets`` index. Same lambda-free
    ``_token_windows`` scaffold, projected with ``concat_ws``."""
    return (
        _token_windows(df, id_col, text_col, n)
        .select(
            F.col(id_col),
            F.concat_ws(" ", *[F.col(f"__w.t{i}") for i in range(n)]).alias(
                "shingle"
            ),
        )
        .distinct()
    )


def ngram_doc_freq(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, top_k: int | None = None
) -> DataFrame:
    """Corpus n-gram document frequencies: in how many documents each
    word n-gram appears (shingles are distinct per doc, so a doc counts
    once however often it repeats the n-gram). Partial aggregation
    (map-side combine) runs before the single shuffle on the n-gram;
    ``top_k`` uses orderBy+limit, which Spark executes as per-partition
    top-k + driver merge (TakeOrdered) — no global sort."""
    freq = (
        shingle_strings(df, id_col, text_col, n)
        .groupBy("shingle")
        .agg(F.count("*").alias("doc_freq"))
    )
    if top_k is not None:
        freq = freq.orderBy(F.desc("doc_freq"), F.asc("shingle")).limit(top_k)
    return freq


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    Inverted-index self-join: docs sharing no shingle never meet. The
    per-shingle fan-out is quadratic in shingle frequency, so
    ``max_doc_freq`` drops shingles appearing in more than that many
    documents from CANDIDATE GENERATION only — the standard stop-shingle
    cut for corpus scale. Set sizes and intersections still count every
    shingle, so reported Jaccard values are exact; the approximation is
    one-sided (a pair overlapping *only* on stop-shingles is missed —
    such pairs are far below any useful threshold anyway). Default None
    = fully exact — meant for bounded inputs (oracles, fixtures) only;
    corpus jobs should go through ``corpus_jaccard_pairs`` (cut on by
    default) or ``minhash_pairs`` (sub-quadratic).

    The index is materialized once — it feeds the self-join (twice) and
    the per-doc sizes, and each consumer would otherwise re-run the
    tokenize→shingle→explode chain.

    A §2.5 core-count spread of the checkpointed index was tried in the
    round-11 optimization pass and REVERTED with numbers: the in-session
    A/B measured +0.2-0.5 s on every jaccard consumer (d02/d20/g01/m13)
    — the extra exchange inside the checkpoint build costs more than
    the few-task self-join map side it parallelizes, because the heavy
    stages here (pair count-aggregation, closure) re-shuffle to core
    count anyway.
    """
    sh = shingle_sets(df, id_col, text_col, n).localCheckpoint(eager=True)
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        cand_sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
        a = cand_sh.alias("a")
        b = cand_sh.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .distinct()
        )
        # exact verification over FULL shingle sets — Jaccard values are
        # unaffected by the cut, only candidate discovery is
        sets_df = df.select(
            F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("sh_set")
        ).filter(F.size("sh_set") > 0)
        sa = sets_df.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("sh_a"))
        sb = sets_df.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("sh_b"))
        inter_sz = F.size(F.array_intersect("sh_a", "sh_b"))
        union_sz = F.size("sh_a") + F.size("sh_b") - inter_sz
        return (
            cands.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("jaccard", inter_sz * F.lit(1.0) / union_sz)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col(f"a.shingle") == F.col(f"b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") * F.lit(1.0) / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram containment pairs: C(A→B) = |A∩B| / |A|.

    Jaccard under-scores subset duplication (a paragraph quoted inside a
    10× longer page has J ≈ 0.1 but containment ≈ 1.0), so near-subset
    dup detection filters on max(C(A→B), C(B→A)) instead — the measure
    used for quote/boilerplate-inclusion dedup. Same inverted-index
    self-join as ``jaccard_pairs`` (one shuffle on the 8-byte shingle
    hash, docs sharing no shingle never meet); only the final scoring
    differs. ``max_doc_freq`` is the standard stop-shingle cut on
    candidate generation for corpus scale (one-sided, scores stay
    exact); None = fully exact for bounded inputs/oracles.

    Returns (id_a, id_b, containment_a, containment_b) with id_a < id_b
    and max(containment) >= threshold.
    """
    sh = shingle_sets(df, id_col, text_col, n).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    cand_sh = sh
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        cand_sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = cand_sh.alias("a")
    b = cand_sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    if max_doc_freq is not None:
        # the cut dropped hot shingles from the intersection counts too;
        # re-score candidates exactly over full sets (same recipe as
        # jaccard_pairs: discovery approximate, scores exact)
        sets_df = df.select(
            F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("sh_set")
        ).filter(F.size("sh_set") > 0)
        sa = sets_df.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("sh_a"))
        sb = sets_df.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("sh_b"))
        scored = (
            inter.select("id_a", "id_b")
            .join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
                F.size("sh_a").alias("n_a"),
                F.size("sh_b").alias("n_b"),
            )
        )
    else:
        sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
        scored = inter.join(sa, "id_a").join(sb, "id_b")
    return (
        scored.withColumn(
            "containment_a", F.col("n_inter") * F.lit(1.0) / F.col("n_a")
        )
        .withColumn("containment_b", F.col("n_inter") * F.lit(1.0) / F.col("n_b"))
        .filter(F.greatest("containment_a", "containment_b") >= threshold)
        .select("id_a", "id_b", "containment_a", "containment_b")
    )


#: Edge-count bound under which connected_components finishes with a
#: driver-side union-find instead of the distributed label loop. The
#: loop costs ~2 Spark jobs per round in fixed scheduler overhead,
#: which dominates micro-batch maintainers (d19/m12) whose within-batch
#: graphs are small by construction; 2^16 deduped edges collect as a
#: couple of MB. Above the bound the distributed loop runs unchanged.
SMALL_GRAPH_EDGES = 1 << 16


def connected_components(
    edges: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    small_graph_edges: int | None = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Connected components of an undirected pair graph → (node, component)
    where ``component`` is the minimum node id reachable from ``node``.

    Dedup needs TRANSITIVE closure: if A≈B and B≈C, all three are one
    duplicate group even when A and C never pair directly. Each round
    runs two monotone label-shrinking steps:

    1. PROPAGATE — every node takes the min of its own label and its
       neighbors' labels (one edges⋈labels shuffle);
    2. POINTER-JUMP (path compression) — every node replaces its label
       with its label's label (one labels⋈labels shuffle). Labels are
       always node ids of the same component with label(x) ≤ x, so the
       jump stays inside the component and only ever decreases.

    Propagation alone needs rounds = component diameter — fine for
    star-like near-dup groups, pathological on chain graphs. The jump
    roughly doubles the distance a min label covers per round, so a
    path of n nodes converges in O(log n) rounds (the same effect as
    Kiveris et al.'s large-star/small-star alternation, in one extra
    bounded shuffle per round). ``max_iter`` still bounds the loop,
    raising if not converged rather than returning wrong labels.

    Fixpoint argument: at convergence label(u) ≤ label(v) for every
    edge (u,v) and symmetrically label(v) ≤ label(u), so labels are
    constant per component; the component's min node m has
    label(m) ≤ m, hence the constant is the component min — identical
    output to plain propagation, just fewer rounds.

    Scale shape: two keyed shuffles per round over bounded frames,
    labels eagerly localCheckpoint'd so lineage stays O(1) deep instead
    of O(rounds). The convergence probe exploits monotonicity: labels
    only ever DECREASE, so the total label sum strictly decreases until
    the fixpoint — one scalar aggregate per round on the checkpointed
    frame (decimal(38,0): exact, no int64 overflow at any node count),
    instead of an old-vs-new join + count.
    """
    # Materialize the edge list ONCE before symmetrizing: the two union
    # branches below reference the same logical subtree, and Spark does
    # not share work across union branches — without this cut the whole
    # upstream pair pipeline (LSH banding + candidate join + exact
    # verification for the cosine path; shingle index + Jaccard verify
    # for the text path) executes TWICE inside the sym checkpoint
    # (guide §2.4 "duplicated subtrees"; measured 2× the verify stage's
    # CPU on d07). Edge rows are O(pairs) ids — tiny blocks either way.
    ed = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    sym = ed.unionByName(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)

    # Small-graph fast path: the (possibly expensive) edge pipeline is
    # materialized exactly once — the checkpoint above — so the count is
    # a cheap cached-block job; when the deduped edge list is driver-
    # sized, finish with a union-find instead of the distributed loop.
    # Union-by-min keeps every root the component minimum, so the output
    # contract (min reachable node id per node) is identical. Numeric
    # node ids only, same as the decimal label-sum probe below.
    # (A take(limit+1) would fuse the two actions but executeTake's
    # incremental partition scanning costs up to THREE jobs when the
    # limit is not reached early — measured worse than count+collect.)
    if small_graph_edges and sym.count() <= small_graph_edges:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for r in sym.collect():  # bounded by small_graph_edges
            a, b = r.src, r.dst
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        node_type = sym.schema["src"].dataType
        out_schema = StructType(
            [
                StructField("node", node_type),
                StructField("component", node_type),
            ]
        )
        return edges.sparkSession.createDataFrame(
            [(n, find(n)) for n in parent], out_schema
        )

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    def label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).first()["s"]

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        neighbor = sym.join(
            labels, sym["src"] == labels["node"], "inner"
        ).select(F.col("dst").alias("node"), "component")
        prop = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer-jump: component <- label(component). Every label IS a
        # node id in `prop` (labels start as ids and min() preserves
        # that), so the self-join always matches; coalesce is belt-and-
        # braces. least() keeps monotonicity explicit.
        jump = prop.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        new_labels = (
            prop.join(jump, prop["component"] == jump["c_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("c_comp", "component"),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter)"
    )


def clusters_from_pairs(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str,
    *,
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster_id) from a near-dup pair graph, for EVERY id in
    ``ids``: members of a transitive group get the group's min id,
    singletons keep their own. The pair source is pluggable — n-gram
    Jaccard, minhash, simhash, embedding cosine — any (id_a, id_b) edge
    frame. ``filter(id == cluster_id)`` is the deterministic keep-set."""
    comp = connected_components(pairs, max_iter=max_iter).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
    return ids.select(id_col).join(comp, id_col, "left").select(
        F.col(id_col),
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    )


def label_conflict_pairs(
    labels: DataFrame,
    *,
    id_col: str,
    dup_col: str,
    distinct_col: str,
    pair_type: str,
) -> DataFrame:
    """Mine cross-signal CONFLICT pairs from two cluster-label columns
    on the same records: within each ``dup_col`` cluster, pair the
    cluster's ANCHOR — the member whose id equals the cluster label,
    which exists because cluster labels are min-member ids
    (clusters_from_pairs contract) — against one representative (min
    id) of every ``distinct_col`` group that DISAGREES with the
    anchor's. These are the hard training pairs: duplicated under one
    signal (e.g. pHash image clusters), distinct under the other (e.g.
    caption near-dup clusters), so a model must rely on the signal
    that differs.

    O(rows) by construction: one groupBy on the label pair plus one
    equi-join on the anchor — one pair per disagreeing (dup, distinct)
    group, never the within-cluster quadratic pair list (the m10/m11
    lesson applied to pair MINING). At 100 TB both inputs are stored
    label tables; the shuffle keys are the cluster labels."""
    anchor = labels.filter(F.col(id_col) == F.col(dup_col)).select(
        F.col(dup_col).alias("__dup"),
        F.col(distinct_col).alias("__anchor_other"),
    )
    groups = labels.groupBy(
        F.col(dup_col).alias("__dup"), F.col(distinct_col).alias("__other")
    ).agg(F.min(id_col).alias("__candidate"))
    return (
        groups.join(anchor, "__dup")
        .filter(F.col("__other") != F.col("__anchor_other"))
        .select(
            F.lit(pair_type).alias("pair_type"),
            F.col("__dup").cast("bigint").alias("anchor_id"),
            F.col("__candidate").cast("bigint").alias("candidate_id"),
        )
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster assignment: every document labeled with the min
    doc id of its transitive near-dup group (Jaccard >= threshold edges);
    documents with no near-dup keep their own id. Output:
    (id_col, cluster_id) — ``filter(id == cluster_id)`` is then the
    deterministic keep-set for corpus dedup."""
    pairs = jaccard_pairs(
        df, id_col, text_col, n=n, threshold=threshold, max_doc_freq=max_doc_freq
    )
    return clusters_from_pairs(df, pairs, id_col, max_iter=max_iter)


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_len: int = 8,
) -> DataFrame:
    """Exact duplicated-substring detection: the maximal token spans of
    length >= ``min_len`` that appear verbatim in at least two documents
    (the substring-dedup primitive of "Deduplicating Training Data Makes
    Language Models Better" — docs are then span-stripped, not dropped).

    Every ``min_len``-token window is hashed (lambda-free: zipped slices,
    explode, one multi-arg xxhash64); windows whose hash occurs in >= 2
    distinct documents are duplicated; per document, runs of duplicated
    windows whose coverage overlaps or touches (position gap <= min_len)
    merge into maximal spans via gaps-and-islands (partitioned window —
    no global sort). Output: (id, span_start, span_end, span_len) in
    token positions, inclusive.

    Scale shape: gram fan-out is narrow (id, pos, 8-byte hash); the
    duplicated-hash set comes from one distinct + one count shuffle; the
    islands pass shuffles once on the doc id."""
    grams = _token_windows(df, id_col, text_col, min_len).select(
        F.col(id_col), F.col("pos"), _window_hash(min_len).alias("h")
    )
    dup_h = (
        grams.select(id_col, "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    dw = grams.join(dup_h, "h").select(id_col, "pos")
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w_doc) <= min_len, F.lit(0)
    ).otherwise(F.lit(1))
    islands = dw.withColumn("brk", brk).withColumn(
        "grp", F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "grp")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + F.lit(min_len - 1)).cast("int").alias("span_end"),
            (F.max("pos") + F.lit(min_len) - F.min("pos")).cast("int").alias(
                "span_len"
            ),
        )
        .drop("grp")
    )


def corpus_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_iter: int = 20,
) -> DataFrame:
    """One-call corpus near-dedup, the 100 TB default path end to end:
    MinHash-LSH candidate pairs (shuffle O(docs × bands), never O(docs²))
    → exact-Jaccard verification → transitive closure → per-document
    (cluster_id, keep). ``filter("keep")`` is the deduplicated corpus;
    keep is deterministic (min id wins). Recall follows minhash_pairs'
    banding bound; everything kept/dropped is exact-verified."""
    pairs = minhash_pairs(df, id_col, text_col, n=n, threshold=threshold)
    labeled = clusters_from_pairs(
        df, pairs.select("id_a", "id_b"), id_col, max_iter=max_iter
    )
    return labeled.withColumn("keep", F.col(id_col) == F.col("cluster_id"))


def cross_corpus_overlap(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
    min_shared: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Benchmark-contamination check: (left_id, right_id, n_shared) for
    every LEFT (eval) / RIGHT (train) document pair sharing at least
    ``min_shared`` distinct word n-grams. Long n-grams (default 8, the
    usual decontamination setting) make random collisions negligible, so
    a hit means verbatim overlap.

    Scale shape: both sides become (id, 8-byte shingle hash) inverted
    indexes, the join key is the hash, and map-side partial aggregation
    precedes the one shuffle to (left_id, right_id). ``max_doc_freq``
    drops n-grams appearing in more than that many TRAIN documents
    (boilerplate that would fan out quadratically) from matching —
    counts then undercount boilerplate-only overlap, the standard cut."""
    ls = shingle_sets(left, id_col, text_col, n).withColumnRenamed(id_col, "left_id")
    rs = shingle_sets(right, id_col, text_col, n).withColumnRenamed(id_col, "right_id")
    if max_doc_freq is not None:
        hot = (
            rs.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        rs = rs.join(F.broadcast(hot), "shingle", "left_anti")
    return (
        ls.join(rs, "shingle")
        .groupBy("left_id", "right_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


#: Stop-shingle cut applied by the corpus-facing entry point below: a
#: shingle shared by more than this many documents is dropped from
#: candidate generation (its self-join fan-out is quadratic in document
#: frequency: one 10k-doc boilerplate shingle alone is 5·10⁷ candidate
#: pairs). Reported Jaccard values remain exact; only discovery of pairs
#: overlapping SOLELY on stop-shingles is lost — far below any useful
#: threshold.
DEFAULT_MAX_DOC_FREQ = 256


def corpus_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = DEFAULT_MAX_DOC_FREQ,
) -> DataFrame:
    """Corpus-scale entry point for exact-Jaccard near-dup pairs.

    Same semantics as ``jaccard_pairs`` but the stop-shingle cut is ON by
    default (``DEFAULT_MAX_DOC_FREQ``): calling the raw operator with
    ``max_doc_freq=None`` on a real corpus invites a quadratic hot-shingle
    fan-out. Use ``jaccard_pairs`` directly only for bounded inputs
    (oracle checks, fixtures) or after verifying shingle frequencies;
    ``minhash_pairs`` is the sub-quadratic path when even the cut index
    is too hot.
    """
    return jaccard_pairs(
        df, id_col, text_col, n=n, threshold=threshold, max_doc_freq=max_doc_freq
    )


#: Odd 64-bit mixing constants for the shingle-window combiner (splitmix64
#: stream, forced odd so multiplication is a bijection mod 2^64).
_WIN_C = splitmix64(0x5EED_C, 4) | np.uint64(1)


def minhash_sketches(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, k: int = MINHASH_K
) -> DataFrame:
    """Per-doc (signature, shingle-hash set) in ONE narrow Arrow pass.

    Tokens are hashed once JVM-side (xxhash64 — |tokens| lambda evals,
    the only per-element JVM work); everything downstream is numpy:
    shingle identity is an avalanche-mixed linear combination of the n
    consecutive token hashes (collision odds ~|sh|²/2⁶⁵ per doc pair —
    the same tolerance as hashed-set Jaccard verification), the distinct
    window hashes ARE the verification set, and the k-member
    multiply-shift family min over them is the signature. One pass
    produces both outputs, so candidate generation and exact
    verification share a single materialized sketch table. Docs with
    < n tokens (no shingles) are dropped, matching jaccard_pairs.
    """
    mult = splitmix64(0x5EED_A, k) | np.uint64(1)
    add = splitmix64(0x5EED_B, k)
    win = _WIN_C[:n]

    def run(batches):
        for pdf in batches:
            ids, sigs, sets_ = [], [], []
            with np.errstate(over="ignore"):
                for doc_id, th in zip(pdf["id"], pdf["th"]):
                    h = np.asarray(th, dtype=np.int64).view(np.uint64)
                    w = np.zeros(len(h) - n + 1, dtype=np.uint64)
                    for j in range(n):
                        w += win[j] * h[j : len(h) - n + 1 + j]
                    # splitmix-style avalanche so linear structure can't
                    # produce systematic collisions across documents
                    w = (w ^ (w >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                    w = (w ^ (w >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                    w ^= w >> np.uint64(31)
                    u = np.unique(w)
                    ids.append(doc_id)
                    sets_.append(u.view(np.int64))
                    sigs.append(
                        (mult[:, None] * u[None, :] + add[:, None]).min(axis=1).view(np.int64)
                    )
            yield pd.DataFrame({"id": ids, "signature": sigs, "sh_set": sets_})

    base = F.transform(F.split(F.col(text_col), " "), lambda t: F.xxhash64(t))
    prepped = df.select(F.col(id_col).alias("id"), base.alias("th")).filter(
        F.size("th") >= n
    )
    return prepped.mapInPandas(
        run, "id long, signature array<long>, sh_set array<long>"
    ).withColumnRenamed("id", id_col)


def band_keys(
    signatures: DataFrame,
    id_col: str,
    *,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
) -> DataFrame:
    """Explode signatures into the LSH band-key index:
    ``(id, band_idx, band_hash)`` — one row per (doc, band).

    This IS the storable published-corpus dedup index: O(docs × bands)
    rows of three longs, derivable from signatures alone (never text),
    and probe-able by a plain equi-join on (band_idx, band_hash). At
    100 TB the index is written once per increment and bucketed by band
    hash so probes are co-located joins, not re-computations.
    """
    return signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.xxhash64(j, F.slice(F.col("signature"), j * rows + 1, rows)),
            )
        ).alias("band_idx", "band_hash"),
    )


def minhash_candidates(
    signatures: DataFrame,
    id_col: str,
    *,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
    materialize: bool = True,
) -> DataFrame:
    """LSH banding: docs agreeing on any (band_idx, band_hash) are candidates.

    Shuffle key is the band hash — O(docs × bands) rows, never O(docs²).
    Signatures are materialized (eager localCheckpoint) before the
    self-join: both join sides share the lineage, and without the
    materialization Spark computes the whole shingle→hash→signature
    chain twice — a lazy persist doesn't help because the self-join's
    two scans race the cache fill within one job. (At 100 TB you would
    write signatures to a table and join against that.) Pass
    ``materialize=False`` if the input is already materialized.
    """
    if materialize:
        signatures = signatures.localCheckpoint(eager=True)
    banded = band_keys(signatures, id_col, bands=bands, rows=rows)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    n_rows: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact Jaccard verification.

    Output = pairs whose TRUE shingle Jaccard >= threshold, found through
    LSH candidates (recall ≈ 1 − (1−t^rows)^bands; ~0.9999 at t=0.5 with
    32×2). Verification joins each candidate to its shingle set and
    computes exact set Jaccard via array_intersect — so precision is
    exact, and the result is deterministic given recall holds.
    """
    # One materialized sketch table feeds BOTH candidate generation and
    # exact verification. Verification compares HASHED shingle sets
    # (array<bigint>), not strings: set Jaccard is identical absent a
    # hash collision inside one document pair (P ≈ |sh|²/2⁶⁵ —
    # vanishing), and the joins shuffle 8-byte longs instead of ~20-char
    # strings.
    #
    # spread first (guide §2.5, the portable_minhash_signatures guard):
    # the numpy sketch pass and the band-key explode both inherit the
    # input's partitioning, and a harness-small/unsplittable scan would
    # serialize them onto 1-3 tasks (d20 measured a 1.8 s three-task
    # band explode). No-op for inputs already at core count. Batch-
    # analytics entry point only — the streaming batch applies keep
    # their own (state_shuffle-sized) layout. ``n_rows`` (when the
    # caller knows the input size without a job — parquet footer
    # metadata) caps the spread width scale-aware; see
    # spread_small_input.
    from censo_escolar_spark.operators.skew import spread_small_input

    df = spread_small_input(df, id_col, rows=n_rows)
    sketches = minhash_sketches(df, id_col, text_col, n=n).localCheckpoint(eager=True)
    cands = minhash_candidates(
        sketches.select(id_col, "signature"), id_col, materialize=False
    )
    sa = sketches.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("sh_a"))
    sb = sketches.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", inter * F.lit(1.0) / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _simhash_pack_udf():
    """Arrow-vectorized vote-packing: per doc, the 60 per-bit ±1 vote sums
    over the token hashes, then bit j set iff votes[j] > 0. The token
    hashes themselves stay JVM-side (md5-derived token_hash60 — identical
    to the DuckDB oracle's nibble arithmetic), so this computes the exact
    same integer as functions.text.simhash's fold — asserted by test —
    at numpy speed instead of 60×|tokens| lambda evals."""
    masks = np.uint64(1) << np.arange(60, dtype=np.uint64)

    @pandas_udf("long")
    def pack(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, arr in enumerate(hashes):
            if arr is None:  # NULL text → hash array NULL → fingerprint 0
                continue
            h = np.asarray(arr, dtype=np.uint64)
            if not len(h):
                continue
            bits = (h[:, None] & masks[None, :]) != 0
            votes = (2 * bits.astype(np.int32) - 1).sum(axis=0)
            out[i] = int(((votes > 0) * masks).sum())
        return pd.Series(out)

    return pack


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc 60-bit simhash: JVM md5 token hashing (narrow) + vectorized
    vote packing. Semantically identical to the pure-JVM
    functions.text.simhash (the slow-path reference implementation)."""
    hashes = F.transform(
        F.array_distinct(F.split(F.col(text_col), " ")), token_hash60
    )
    return df.select(
        F.col(id_col), _simhash_pack_udf()(hashes).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Band join finds every pair within hamming ``n_bands - 1`` (pigeonhole),
    then the exact hamming filter runs on candidates only. Requires
    ``max_hamming < n_bands`` for exactness — asserted, because silently
    lossy candidate generation would diverge from the brute-force oracle.
    """
    assert max_hamming < n_bands, "pigeonhole exactness requires max_hamming < n_bands"
    # materialize: the band self-join would otherwise compute every
    # fingerprint twice (same rationale as minhash_candidates). A §2.5
    # core-count spread of the input was tried in the round-11
    # optimization pass and REVERTED: in-session A/B measured +0.15 s
    # (d05) — the pack pass is too cheap here for the extra exchange.
    fps = simhash_fingerprints(df, id_col, text_col).localCheckpoint(eager=True)
    return simhash_pairs_from_fingerprints(
        fps, id_col, max_hamming=max_hamming, n_bands=n_bands
    )


def simhash_pairs_from_fingerprints(
    fps: DataFrame,
    id_col: str,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Pigeonhole band join over an existing (id, simhash) frame.

    Split out of ``simhash_pairs`` so callers can pre-contract identical
    fingerprints (GROUP BY simhash, keep min id) before pairing — on
    dedup graphs the identical-document groups are large cliques, and
    any graph analytics downstream (triangles, components) should run
    on the contracted multigraph, not the raw one. ``fps`` must be
    cheap to evaluate or already materialized: the band self-join
    references it twice.
    """
    assert max_hamming < n_bands, "pigeonhole exactness requires max_hamming < n_bands"
    banded = fps.select(
        F.col(id_col),
        "simhash",
        F.posexplode(simhash_bands(F.col("simhash"), n_bands)).alias("band_idx", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming60(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS).

    Rolling k-token-gram hashes; every window of ``w`` consecutive gram
    positions contributes its minimum ``(hash, position)`` pair; the
    distinct selected pairs are the document's fingerprint. Guarantees
    any shared token run of >= k + w - 1 tokens between two documents
    yields at least one shared fingerprint — the classic plagiarism /
    near-dup detection sketch, and (unlike t03's global bottom-k) it is
    *positional*: matches localize to regions.

    The reference has no fingerprinting at all (SURVEY §2h — its only
    hashing is Python dict lookups, transform.py:33-38); this is a
    north-star operator.

    Scale: the gram fan-out is narrow (explode, no shuffle); the single
    shuffle is the window partition on ``id_col``, whose state per key is
    bounded by document length — cap documents upstream (t07 chunking)
    rather than letting one 10 GB doc pin an executor. min-of-struct is
    an order-statistic the JVM evaluates inside the frame without
    Python. The distinct that removes windows sharing one minimum
    re-uses the window shuffle's partitioning (no second exchange).
    """
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = df.select(F.col(id_col), t.alias("t"), (F.size(t) - (k - 1)).alias("n_grams"))
    gram = F.concat_ws(
        " ", *[F.element_at(F.col("t"), F.col("i") + j) for j in range(k)]
    )
    grams = (
        toks.select(
            id_col,
            "n_grams",
            F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("i"),
            "t",
        )
        .select(
            id_col,
            "n_grams",
            F.col("i").cast("bigint").alias("i"),
            F.md5(gram).alias("h"),
        )
    )
    win = Window.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    sel = F.min(F.struct(F.col("h").alias("h"), F.col("i").alias("p"))).over(win)
    return (
        grams.select(id_col, "n_grams", "i", sel.alias("s"))
        .filter(F.col("i") <= F.col("n_grams") - (w - 1))
        .select(
            id_col,
            F.col("s.h").alias("fp_hash"),
            F.col("s.p").alias("fp_pos"),
        )
        .distinct()
    )


def strip_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_len: int = 8,
) -> DataFrame:
    """Apply-side of ``duplicate_spans``: remove every duplicated maximal
    span's tokens from each document, keeping the remainder in order
    (span-stripping per "Deduplicating Training Data Makes Language
    Models Better" — the doc survives, the verbatim-shared substring
    does not).

    Scale shape: tokens posexplode to (id, pos, tok) — narrow rows; the
    span filter is a left-anti join whose equi key is the doc id (the
    in-span range predicate rides along inside the same hash join, one
    shuffle); reassembly is one groupBy(id) over sort_array(collect_list)
    — the same single-doc-partition reduction every per-doc text op
    here uses. Docs with no duplicated spans pass through verbatim.
    """
    spans = duplicate_spans(df, id_col, text_col, min_len=min_len)
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    sp = spans.select(F.col(id_col).alias("__sid"), "span_start", "span_end")
    kept = toks.join(
        sp,
        (toks[id_col] == F.col("__sid"))
        & (F.col("pos") >= F.col("span_start"))
        & (F.col("pos") <= F.col("span_end")),
        "left_anti",
    )
    before = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("n_tokens_before")
    )
    after = kept.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_tokens_after"),
        F.concat_ws(
            " ", F.transform(F.sort_array(F.collect_list(F.struct("pos", "tok"))), lambda s: s.tok)
        ).alias("stripped_text"),
    )
    return (
        before.join(after, id_col, "left")
        .select(
            id_col,
            "n_tokens_before",
            F.coalesce("n_tokens_after", F.lit(0)).cast("int").alias("n_tokens_after"),
            F.coalesce("stripped_text", F.lit("")).alias("stripped_text"),
        )
    )


def incremental_dedup(
    new_docs: DataFrame,
    published: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_iter: int = 20,
) -> DataFrame:
    """Dedup an INCREMENT against an already-published corpus — the
    production shape of corpus growth (daily crawl batches; the
    reference's O1 idempotent per-year increments, censo_escolar.py:
    39-60, lifted to near-dup semantics).

    Two stages, both on banded candidates (never all-pairs):

    1. cross-batch: a new doc with a near-dup (exact Jaccard >=
       threshold) in ``published`` is dropped — the corpus already
       represents it. Candidates come from one minhash banding over
       the union, filtered to cross-side pairs, so the published side
       contributes signatures only (at scale: the stored index table,
       bucketed by band key — the increment probes it like a
       partition-pruned join).
    2. within-batch: survivors are near-deduped among themselves via
       the standard pairs → transitive closure → min-id-keep path.

    Returns every new doc with (cluster_id, dup_of_published, keep):
    ``filter("keep")`` is the publishable increment. Cross-
    contaminated docs keep their own id as cluster_id (their cluster
    lives in the published corpus, not the batch).

    Drop-then-cluster order matters and is deliberate: a published
    near-dup makes the new doc REDUNDANT, so it must not also anchor a
    within-batch cluster (its remaining members are kept only if no
    published twin of their own). Incremental output therefore differs
    (correctly) from re-running full-corpus dedup over
    published ∪ batch: increments never retroactively delete published
    docs.

    This convenience form re-sketches the published TEXT on every call —
    fine for one-shot backfills, wrong growth curve for repeated
    increments. Production increments (streaming/dedup.py) store the
    published side's sketches + band index once and call
    ``incremental_dedup_indexed`` directly, so each increment's work is
    O(batch), never O(corpus).
    """
    pub_sk = minhash_sketches(published, id_col, text_col, n=n).localCheckpoint(
        eager=True
    )
    return incremental_dedup_indexed(
        new_docs,
        pub_sk,
        id_col,
        text_col,
        n=n,
        threshold=threshold,
        max_iter=max_iter,
    )


def validate_signature_layout(
    frame: DataFrame, side: str, *, bands: int, rows: int
) -> bool:
    """Guard against probing a stored index with a mismatched banding
    layout (mismatched slicing silently loses candidates): a one-row
    bounded peek at the signature length. Raises on mismatch; returns
    whether a row was actually checked (False on an empty frame —
    nothing published yet — so callers caching a successful validation
    don't cache a vacuous one)."""
    head = frame.select(F.size("signature").alias("k")).head(1)
    if head and head[0].k != bands * rows:
        raise ValueError(
            f"{side} signature length {head[0].k} != bands*rows ="
            f" {bands * rows}; pass the bands/rows the index was"
            " built with"
        )
    return bool(head)


def incremental_dedup_indexed(
    new_docs: DataFrame,
    published_sketches: DataFrame,
    id_col: str,
    text_col: str,
    *,
    new_sketches: DataFrame | None = None,
    published_bands: DataFrame | None = None,
    n: int = 3,
    threshold: float = 0.5,
    max_iter: int = 20,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
    validate: bool = True,
) -> DataFrame:
    """``incremental_dedup`` against a STORED signature index — the
    published corpus contributes only its persisted sketches
    ``(id, signature, sh_set)`` (and optionally the pre-exploded
    ``band_keys`` index); its text is never re-read, so an increment
    costs O(batch sketching + candidate joins), independent of corpus
    size. Same output contract as ``incremental_dedup``.

    - ``published_sketches``: (id_col, signature, sh_set) as produced by
      ``minhash_sketches`` — the exact-Jaccard verification side.
    - ``published_bands``: optional stored (id_col, band_idx, band_hash)
      index (``band_keys`` layout); derived from the signatures when
      absent (cheap — 64 longs/doc, no text).
    - ``new_sketches``: optional pre-materialized batch sketches (the
      streaming maintainer computes them once and reuses them for the
      state append).
    - ``bands``/``rows``: the banding layout, which must match the
      layout the STORED sketches/index were built with — sketches built
      with a non-default signature length would otherwise slice bands
      inconsistently and silently lose candidates, so the provided
      frames' signature length is validated (one-row bounded peek) —
      ``validate=False`` skips the peeks for callers that validated the
      store themselves (the streaming maintainer caches one successful
      validation per store per process and builds its batch sketches
      with the right k by construction).
    """
    if validate:
        for side, frame in (
            ("published_sketches", published_sketches),
            ("new_sketches", new_sketches),
        ):
            if frame is None:
                continue
            validate_signature_layout(frame, side, bands=bands, rows=rows)
    if new_sketches is None:
        new_sketches = minhash_sketches(
            new_docs, id_col, text_col, n=n, k=bands * rows
        ).localCheckpoint(eager=True)
    if published_bands is None:
        published_bands = band_keys(published_sketches, id_col, bands=bands, rows=rows)
    new_bands = band_keys(new_sketches, id_col, bands=bands, rows=rows)

    # Cross-batch probe: batch band keys against the published index.
    # Same hash family + banding as the union formulation, so candidates
    # are identical; verification is exact hashed-shingle Jaccard.
    cross = (
        new_bands.alias("a")
        .join(
            published_bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash")),
        )
        .select(
            F.col(f"a.{id_col}").alias("new_id"),
            F.col(f"b.{id_col}").alias("pub_id"),
        )
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    cross_hit = (
        cross.join(
            new_sketches.select(
                F.col(id_col).alias("new_id"), F.col("sh_set").alias("sh_a")
            ),
            "new_id",
        )
        .join(
            published_sketches.select(
                F.col(id_col).alias("pub_id"), F.col("sh_set").alias("sh_b")
            ),
            "pub_id",
        )
        .filter(inter * F.lit(1.0) / union >= threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
        # tiny (ids with a published twin) but its lineage is the whole
        # index probe + verification; survivors has several consumers
        .localCheckpoint(eager=True)
    )
    survivors = new_docs.join(cross_hit, id_col, "left_anti")
    surv_ids = survivors.select(id_col)
    surv_bands = new_bands.join(surv_ids, id_col)
    within_cands = (
        surv_bands.alias("a")
        .join(
            surv_bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # within-batch edges are tiny (near-dup pairs) but every closure
    # iteration would re-run banding + verification without an eager cut
    within = (
        within_cands.join(
            new_sketches.select(
                F.col(id_col).alias("id_a"), F.col("sh_set").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            new_sketches.select(
                F.col(id_col).alias("id_b"), F.col("sh_set").alias("sh_b")
            ),
            "id_b",
        )
        .filter(inter * F.lit(1.0) / union >= threshold)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    labeled = clusters_from_pairs(survivors, within, id_col, max_iter=max_iter)
    return (
        new_docs.select(id_col)
        .join(labeled, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            F.col("cluster_id").isNull().alias("dup_of_published"),
        )
        .withColumn(
            "keep",
            ~F.col("dup_of_published") & (F.col(id_col) == F.col("cluster_id")),
        )
    )


def dedup_keep_best(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quality_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-dup dedup that keeps the BEST document per cluster instead
    of the min-id one — the form production corpus dedup actually uses
    (drop the low-quality copies, e.g. the truncated or boilerplate
    mirror, keep the highest-quality member).

    Winner per transitive near-dup cluster = max ``quality_col``,
    ties broken by min id (fully deterministic, so partitioning and
    retries cannot flip winners). Output: (id, cluster_id, quality,
    keep). Plan: the d06 cluster assignment + ONE per-cluster window —
    cluster cardinality is tiny relative to the corpus, and the window
    partitions by cluster_id, so no global ordering appears anywhere.
    """
    labeled = dedup_clusters(
        df, id_col, text_col, n=n, threshold=threshold, max_doc_freq=max_doc_freq
    )
    scored = labeled.join(
        df.select(id_col, quality_col), id_col
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return scored.withColumn(
        "keep", F.row_number().over(w) == 1
    ).select(id_col, "cluster_id", quality_col, "keep")


def portable_minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    n_hashes: int = 16,
) -> DataFrame:
    """PORTABLE minhash signatures: hash family h_i(s) = first 60 bits
    of md5(shingle || ':' || i) — reproducible in any engine or
    language with an md5 primitive, so signatures written by this
    engine can be probed by another system (and vice versa). The
    interchange counterpart of ``minhash_signatures``'s splitmix64
    family (which is ~10× cheaper and preferred when signatures never
    leave the engine).

    One shingle fan-out, ``n_hashes`` md5 evaluations per shingle row
    (all codegen), one partial-aggregated groupBy per document.
    Returns (id, sig array<long> of length n_hashes).

    The md5 family is CPU-dense (~n_hashes digests per shingle row), so
    the fan-out must not inherit the SCAN's parallelism when the input
    is a small/unsplittable file set (a single-row-group parquet file
    scans as ONE task — guide §2.5 input skew; d17 measured a 4.5 s
    single-task hashing stage on the harness). When the input has fewer
    partitions than cores, the documents are hash-repartitioned by id
    first — a shuffle of the (small, by premise) text that unlocks
    core-count hashing, and with the partition count matching
    ``spark.sql.shuffle.partitions`` the downstream per-id groupBy
    reuses the exchange. Inputs already wider than the core count (any
    real corpus) skip this entirely — repartitioning 100 TB of text
    would add a payload shuffle for nothing.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism, F.col(id_col))
    sh = shingle_strings(df, id_col, text_col, n)
    hashes = [
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("shingle"), F.lit(f":{i}"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias(f"__h{i}")
        for i in range(n_hashes)
    ]
    per = sh.select(F.col(id_col), *hashes)
    sig = per.groupBy(id_col).agg(
        *[F.min(f"__h{i}").alias(f"__m{i}") for i in range(n_hashes)]
    )
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"__m{i}") for i in range(n_hashes)]).alias("sig"),
    )


def minhash_estimate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs with ESTIMATED Jaccard — the sketch-only regime.

    ``minhash_lsh_pairs`` exact-verifies candidates against full
    shingle sets; at 100 TB that second pass re-reads text. This
    variant never touches the text after signatures exist: candidates
    come from banded signature agreement (shuffle O(docs × bands) of
    string band keys), and the reported similarity is the unbiased
    minhash estimate matches/n_hashes (±1/√n_hashes ≈ 0.25 @ 16 —
    widen n_hashes for tighter bands). Built on the PORTABLE md5 hash
    family, so a SQL oracle replays the identical estimate bit for bit
    — and stored signatures interoperate across engines.

    ``threshold`` filters on the ESTIMATE (quantized to multiples of
    1/n_hashes); with n_bands bands of r = n_hashes/n_bands rows,
    candidate recall at true Jaccard j is 1 − (1 − j^r)^b.
    """
    assert n_hashes % n_bands == 0
    rows_per_band = n_hashes // n_bands
    sig = portable_minhash_signatures(
        df, id_col, text_col, n=n, n_hashes=n_hashes
    ).localCheckpoint(eager=True)  # banding + both estimate joins reuse it
    band_keys = F.array(
        *[
            F.concat_ws(
                "_",
                *[
                    F.col("sig").getItem(b * rows_per_band + j)
                    for j in range(rows_per_band)
                ],
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(
        F.col(id_col).alias("id"), F.posexplode(band_keys).alias("band_idx", "band_key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("__sa"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("__sb"))
    matches = F.expr("size(filter(zip_with(__sa, __sb, (x, y) -> x = y), v -> v))")
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (matches.cast("double") / F.lit(float(n_hashes))).alias(
                "est_jaccard"
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
