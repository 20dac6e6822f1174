"""Text-analysis column expressions — all JVM-side (zero Python UDFs).

Building blocks for the LLM-data-pipeline operators: tokenization,
shingling, quality scoring, language heuristics, and document
fingerprints (md5 / simhash / bottom-k). Everything is a Column
expression inside whole-stage codegen, and — critically for 100 TB —
the signature computations (simhash, minhash) are *narrow*: per-row
higher-order functions with no shuffle at all.

Cross-engine notes (the DuckDB oracles mirror these semantics):
- ``split(text, ' ')`` == DuckDB ``string_split(text, ' ')``;
- ``md5`` hex strings are identical across engines;
- hex→int is Spark ``conv(hex,16,10)`` vs DuckDB nibble arithmetic —
  different mechanics, identical 60-bit value.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny English stopword list for the quality/language heuristics; kept
#: inline so DuckDB oracles can embed the identical list.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: str | Column) -> Column:
    """Whitespace tokens (literal-space split, keeps empties on runs)."""
    return F.split(_c(col), " ")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: str | Column) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def char_count(col: str | Column) -> Column:
    return F.length(_c(col))


def avg_token_len(col: str | Column) -> Column:
    """Mean token length = (chars - separators) / tokens — closed form, so
    the oracle reproduces it without per-token aggregation."""
    return (F.length(_c(col)) - (token_count(col) - 1)).cast("double") / token_count(
        col
    ).cast("double")


def stopword_ratio(col: str | Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (quality / language-ID signal)."""
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop.cast("double") / F.size(toks).cast("double")


#: Marker stopwords per language for the lang-ID heuristic. Tiny on
#: purpose: inline-able in a DuckDB oracle, and a broadcast-free literal
#: in the Spark plan. Extendable without changing the operator.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "nicht", "das"),
    "en": ("the", "of", "and", "is", "to"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def lang_id(col: str | Column, markers: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Marker-word language ID: argmax of per-language marker-token counts,
    ties broken alphabetically, no markers at all → 'unknown'.

    Entirely JVM-side: one tokenize, one count per language, then a
    sort_array over (−score, lang) structs picks the winner — struct
    ordering is field-by-field in both Spark and DuckDB, so the oracle
    states the identical argmax. A real system would use char-n-gram
    profiles (fasttext-style); the *operator shape* — per-class score →
    deterministic argmax — is the same, and scoring stays narrow."""
    if markers is None:
        markers = LANG_MARKERS
    toks = tokens(col)
    scored = []
    for lang in sorted(markers):
        mk = F.array(*[F.lit(m) for m in markers[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(mk, t)))
        scored.append(F.struct((-score).alias("neg"), F.lit(lang).alias("lang")))
    best = F.sort_array(F.array(*scored))[0]
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("unknown"))


#: GPT-2-style pre-tokenizer, minus constructs RE2 (DuckDB) lacks
#: (lookahead, contraction alternates): letter runs, digit runs, and
#: punctuation runs each with an optional leading space, plus whitespace.
BPE_PRETOKEN_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_token_count(col: str | Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer — the standard proxy
    for LLM token budgets (whitespace splitting undercounts punctuation-
    heavy text). regexp_count stays in codegen; no UDF."""
    return F.regexp_count(_c(col), F.lit(BPE_PRETOKEN_RE))


#: PII patterns, RE2-safe (no lookahead/backreferences) so the identical
#: pattern string runs in Spark (Java regex) and DuckDB (RE2). Applied in
#: dict order: emails first (so the @-local-part's digits can't be eaten
#: by the number patterns), then IPs (dotted quads would otherwise feed
#: the phone pattern), then phones.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{3,4}\b", "<PHONE>"),
}


def redact_pii(col: str | Column) -> Column:
    """Replace every PII match with its tag — chained regexp_replace,
    all inside codegen. Counts come from ``pii_count`` on the ORIGINAL
    column (redaction destroys the matches)."""
    out = _c(col)
    for pattern, tag in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_count(col: str | Column, kind: str) -> Column:
    """Number of matches of one PII pattern (kind ∈ PII_PATTERNS)."""
    return F.regexp_count(_c(col), F.lit(PII_PATTERNS[kind][0]))


def repetition_stats(col: str | Column) -> dict[str, Column]:
    """Gopher-style repetition signals, all closed-form (no per-doc agg):

    - ``dup_token_frac``: 1 − |distinct tokens| / |tokens| — the mass of
      repeated tokens;
    - ``dup_bigram_frac``: same over adjacent-token bigrams (repeated
      phrases score here even when individual words differ in count).

    The top-token-dominance signal needs a per-token frequency argmax and
    lives in the t10 plan (explode → two-level aggregate), not here.

    Bigrams are built lambda-free (two aligned ``slice``s zipped — all
    codegen) rather than via the ``shingles`` HOF: interpreted lambdas
    cost ~1 µs/element and this runs per document over the whole corpus.
    """
    toks = tokens(col)
    n = F.size(toks)
    nb = n - 1
    bigrams = F.arrays_zip(
        F.slice(toks, F.lit(1), nb).alias("a"), F.slice(toks, F.lit(2), nb).alias("b")
    )
    return {
        "dup_token_frac": F.when(
            n > 0,
            F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0)),
        "dup_bigram_frac": F.when(
            nb > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(bigrams)).cast("double") / nb.cast("double"),
        ).otherwise(F.lit(0.0)),
    }


#: Web-curation patterns, RE2-safe (shared verbatim with the DuckDB
#: oracle). URL_RE is group-free so regexp_extract_all/regexp_count see
#: the full match; DOMAIN_RE captures the host as group 1.
URL_RE = r"https?://[A-Za-z0-9./_%-]+"
DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"
#: One boilerplate LINE: anchored at line start under (?m), consumes the
#: whole line via [^\n]* (never the terminator — no $\n? subtleties whose
#: anchor semantics could diverge between Java regex and RE2). Stripping
#: leaves an empty line behind, which line counters ignore.
BOILERPLATE_RE = (
    r"(?im)^[^\n]*(copyright|all rights reserved|cookie|subscribe|"
    r"terms of service)[^\n]*"
)


def url_count(col: str | Column) -> Column:
    """Number of http(s) URLs in the text."""
    return F.regexp_count(_c(col), F.lit(URL_RE))


def first_domain(col: str | Column) -> Column:
    """Host of the first URL ('' when the text has none — regexp_extract's
    no-match value in both Spark and DuckDB)."""
    return F.regexp_extract(_c(col), DOMAIN_RE, 1)


#: First URL including its path, host as group 1, path as group 2.
_FIRST_URL_RE = r"https?://([A-Za-z0-9.-]+)(/[A-Za-z0-9./_%-]*)?"


def canonical_url(col: str | Column) -> Column:
    """Canonical form of the FIRST http(s) URL in the text, or '' when
    there is none: scheme dropped, host lowercased and 'www.'-stripped,
    query/fragment cut (the capture stops at path characters), trailing
    slashes trimmed. The canonical key behind URL-level dedup — CC-style
    pipelines dedup on this BEFORE any content hashing, because the same
    page is crawled under http/https/www variants and tracking-param
    decorations.

    Every step is a codegen regexp/string expression shared verbatim
    with the SQL oracle (d16), so canonical keys are engine-portable.
    """
    c = _c(col)
    host = F.lower(F.regexp_extract(c, _FIRST_URL_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(c, _FIRST_URL_RE, 2)
    path = F.regexp_replace(path, r"/+$", "")
    return F.when(host == "", F.lit("")).otherwise(F.concat(host, path))


def strip_boilerplate(col: str | Column) -> Column:
    """Blank out boilerplate lines (copyright/cookie/subscribe/ToS
    notices). Lines are emptied, not spliced out, so surviving content
    keeps its original line numbers; count remaining content with
    ``nonempty_line_count``."""
    return F.regexp_replace(_c(col), BOILERPLATE_RE, "")


def nonempty_line_count(col: str | Column) -> Column:
    """Number of lines with at least one non-newline character."""
    return F.regexp_count(_c(col), F.lit(r"[^\n]+"))


def digit_ratio(col: str | Column) -> Column:
    c = _c(col)
    return (F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))).cast(
        "double"
    ) / F.length(c).cast("double")


def quality_keep(
    col: str | Column,
    *,
    min_tokens: int = 10,
    max_digit_ratio: float = 0.3,
    min_avg_token_len: float = 2.0,
) -> Column:
    """Corpus-curation keep/drop decision from the quality signals —
    boolean column, so the filter composes with any other predicate and
    pushes into the scan where possible."""
    return (
        (token_count(col) >= min_tokens)
        & (digit_ratio(col) <= max_digit_ratio)
        & (avg_token_len(col) >= min_avg_token_len)
    )


def _md5_bucket(col: str | Column, n_hex: int) -> Column:
    """First ``n_hex`` hex chars of md5 as an int — the shared
    content-hash bucketing contract behind every deterministic
    keep/drop/split decision (DuckDB side:
    ``('0x' || substr(md5(x), 1, n))::BIGINT``)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, n_hex), 16, 10).cast("int")


def deterministic_sample(col: str | Column, keep_percent: int) -> Column:
    """Content-hash sampling: keep rows whose md5(text) first byte falls
    under the cut. Deterministic across runs/engines (unlike rand() or
    sampleBy), so train/eval splits are reproducible and the same row
    always lands in the same split. keep_percent ∈ [0, 100] maps to a
    0-255 byte threshold (resolution ~0.4%)."""
    cut = int(256 * keep_percent / 100)
    return _md5_bucket(col, 2) < cut


def split_assign(
    col: str | Column, *, train_pct: int = 80, val_pct: int = 10
) -> Column:
    """Deterministic train/val/test assignment from the content hash
    (first 2 md5 bytes → 0..65535, resolution ~0.0015%): the same
    document always lands in the same split, on any engine, with no RNG
    state — the reproducibility contract ``deterministic_sample``
    provides for keep/drop, extended to a 3-way label."""
    h = _md5_bucket(col, 4)
    t_cut = 65536 * train_pct // 100
    v_cut = 65536 * (train_pct + val_pct) // 100
    return (
        F.when(h < t_cut, F.lit("train"))
        .when(h < v_cut, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def chunk_spans(col: str | Column, max_tokens: int) -> Column:
    """Token-window chunking for LLM context budgets: array of
    (chunk_idx, chunk_text) structs, each chunk ≤ max_tokens whitespace
    tokens, concatenation losslessly reconstructs the token stream.
    Explode downstream for one row per chunk — a narrow op; long
    documents fan out without any shuffle."""
    toks = tokens(col)
    n_chunks = F.ceil(F.size(toks) / F.lit(max_tokens)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * max_tokens + 1, max_tokens)).alias(
                "chunk_text"
            ),
        ),
    )


def fingerprint_md5(col: str | Column) -> Column:
    """Exact-dedup fingerprint: md5 of whitespace-normalized lowercase text."""
    return F.md5(F.lower(F.trim(F.regexp_replace(_c(col), "\\s+", " "))))


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (Jaccard/minhash input).

    Documents shorter than ``n`` tokens yield an empty array; consumers
    using ``explode`` drop them — matching the SQL
    ``generate_series(1, len-n+1)`` formulation which emits no rows.
    """
    toks = tokens(col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, make).otherwise(F.array().cast("array<string>"))


def min_shingle_md5_udf(n: int = 3):
    """Bottom-1 shingle sketch, Arrow-vectorized: min md5 hex over the
    doc's word n-gram shingles (None below n tokens).

    hashlib md5 of ~50 short strings per doc costs ~25 µs; the same min
    through nested higher-order functions (sequence → concat_ws(slice) →
    md5 → array_min) costs ~100× that in lambda-eval overhead. Python
    ``str.split(' ')`` keeps empty tokens exactly like Spark's literal
    split, and hexdigest matches Spark/DuckDB md5 output — asserted by
    the t03 oracle."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    def _one(t: str) -> str | None:
        toks = t.split(" ")
        if len(toks) < n:
            return None
        return min(
            hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
            for i in range(len(toks) - n + 1)
        )

    @pandas_udf("string")
    def min_md5(texts: pd.Series) -> pd.Series:
        return texts.map(_one, na_action="ignore")  # NULL text → NULL sketch

    return min_md5


# --- simhash (60-bit, md5-based, deterministic) --------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit integer

def _pow2() -> Column:
    """2^j masks as an array literal — shiftleft/shiftright take only
    literal ints, so bit j is tested as (h & 2^j) != 0 inside lambdas.
    Built lazily: Column construction needs an active SparkContext."""
    return F.array(*[F.lit(1 << j).cast("bigint") for j in range(SIMHASH_BITS)])


def token_hash60(tok: Column) -> Column:
    """First 60 bits of md5(token) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint")


def simhash(col: str | Column) -> Column:
    """60-bit simhash over the document's *distinct* token set.

    Narrow plan: tokens → per-token 60-bit md5 → fold into 60 per-bit
    vote counters (+1 if bit set, −1 otherwise) → bit j of the result is
    set iff its counter is > 0 (tie → 0). No shuffle, no UDF; the whole
    thing is one codegen'd expression tree.
    """
    pow2 = _pow2()
    toks = F.array_distinct(tokens(col))
    hashes = F.transform(toks, token_hash60)
    zeros = F.array_repeat(F.lit(0).cast("bigint"), SIMHASH_BITS)
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            pow2,
            lambda a, p: a
            + F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)).cast("bigint"),
        ),
    )
    bits = F.zip_with(
        votes, pow2, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("bigint"))
    )
    return F.aggregate(bits, F.lit(0).cast("bigint"), lambda acc, b: acc + b)


def hamming60(a: Column, b: Column) -> Column:
    """Hamming distance between two 60-bit simhashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_bands(col: Column, n_bands: int = 4) -> Column:
    """Split a 60-bit simhash into ``n_bands`` equal bit-bands.

    Pigeonhole: two hashes within hamming distance ``n_bands - 1`` share
    at least one identical band — the candidate-generation key for
    distributed near-dup search (join on (band_idx, band_value) instead
    of O(n²) pairs).
    """
    assert SIMHASH_BITS % n_bands == 0
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    return F.array(
        *[
            F.shiftright(col, i * width).bitwiseAND(F.lit(mask).cast("bigint"))
            for i in range(n_bands)
        ]
    )


# --- readability -----------------------------------------------------------

#: Sentence terminators (a run counts once) and syllable proxy (vowel
#: groups per lowercased text). Both patterns are RE2-safe and shared
#: verbatim with the DuckDB oracles so the engines can never drift.
SENTENCE_RE = r"[.!?]+"
SYLLABLE_RE = r"[aeiouy]+"


def sentence_count(col: str | Column) -> Column:
    """Number of sentence-terminator runs (min 1 — headline-style text
    with no terminal punctuation still reads as one sentence)."""
    return F.greatest(F.regexp_count(F.col(col) if isinstance(col, str) else col,
                                     F.lit(SENTENCE_RE)), F.lit(1)).cast("bigint")


def syllable_count(col: str | Column) -> Column:
    """Vowel-group syllable proxy — the standard closed-form estimator
    (exact syllabification needs a dictionary; the proxy is monotone
    with it and identical cross-engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(SYLLABLE_RE)).cast("bigint")


def flesch_reading_ease(col: str | Column) -> Column:
    """Flesch reading ease: 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words). All three counts are codegen regex/split
    expressions — one pass over the text, no Python."""
    words = token_count(col).cast("double")
    sents = sentence_count(col).cast("double")
    sylls = syllable_count(col).cast("double")
    return (
        F.lit(206.835) - F.lit(1.015) * (words / sents) - F.lit(84.6) * (sylls / words)
    )


# --- normalization ---------------------------------------------------------

#: Accent-fold table shared verbatim with SQL oracles (translate() has
#: Postgres semantics in both engines: positional char-for-char map).
ACCENT_SRC = "áàâãäåéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
ACCENT_DST = "aaaaaaeeeeiiiiooooouuuucnyAAAAAAEEEEIIIIOOOOOUUUUCNY"


def normalize_text(col: str | Column) -> Column:
    """Canonical text form for matching/dedup keys: accent-fold,
    lowercase, collapse whitespace runs, trim. All codegen string ops —
    the preprocessing step ahead of fingerprint_md5/dedup when inputs
    come from accent-bearing sources (the census data is Portuguese)."""
    c = _c(col)
    return F.trim(
        F.regexp_replace(
            F.lower(F.translate(c, ACCENT_SRC, ACCENT_DST)), r"\s+", " "
        )
    )


# ---------------------------------------------------------------------------
# Learned-quality-classifier scoring lane (t42/t43): the FineWeb-Edu-
# style per-document classifier score, deterministic by construction so
# the DuckDB oracle replays it bit-for-bit. A real deployment swaps the
# weights for trained ones — the Spark plan (feature extraction in
# codegen, one linear form per row, no UDF) is exactly the serving
# shape; what is faked here is only the training.
#
# Weight MAGNITUDES are splitmix64-derived (hashing.splitmix64, seed
# 0x5174C0DE, (v % 2001 - 1000) / 1000), SIGNS are curation priors
# (unique-token and stopword mass up, mean-word-length and digit mass
# down). The values are embedded as repr() literals here AND as
# CAST('<repr>' AS DOUBLE) in the oracles — strtod round-trips repr, so
# both engines hold the identical doubles.
#
# Float discipline: each feature is ONE IEEE division of exact integer
# counts; the linear form is a FIXED left-to-right chain of per-row
# scalars; the squash is ALGEBRAIC (s / (1 + |s|)) because exp() is not
# correctly rounded across libms while abs/add/divide are IEEE-exact.
# No cross-row float aggregation anywhere (t43 quantizes scores to
# BIGINT before summing).
# ---------------------------------------------------------------------------
QUALITY_WEIGHTS = {
    "bias": 0.129,
    "mwl": -0.184,
    "uniq": 0.635,
    "stop": 0.318,
    "digit": -0.844,
}


def learned_quality(col: str | Column) -> dict[str, Column]:
    """Per-document quality features + classifier score + 0-4 grade.

    Returns columns {mwl, uniq_ratio, stop_ratio, digit_ratio, score,
    grade}: mean word length, distinct-token ratio, stopword-hit ratio,
    digit-character ratio, the squashed linear score in (-1, 1), and
    grade = floor((score + 1) * 2.5) in 0..4 (the FineWeb-Edu-style
    integer rating downstream filters cut on, e.g. grade >= 3)."""
    c = _c(col)
    toks = tokens(c)
    n = F.size(toks).cast("double")
    mwl = (F.length(c) - (F.size(toks) - 1)).cast("double") / n
    uniq = F.size(F.array_distinct(toks)).cast("double") / n
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop = F.size(F.array_intersect(F.array_distinct(toks), sw)).cast("double") / n
    nchars = F.length(c)
    digit = F.when(
        nchars > 0,
        (nchars - F.length(F.regexp_replace(c, "[0-9]", ""))).cast("double")
        / nchars.cast("double"),
    ).otherwise(F.lit(0.0))
    w = QUALITY_WEIGHTS
    s = (
        F.lit(w["bias"])
        + F.lit(w["mwl"]) * mwl
        + F.lit(w["uniq"]) * uniq
        + F.lit(w["stop"]) * stop
        + F.lit(w["digit"]) * digit
    )
    score = s / (F.lit(1.0) + F.abs(s))
    grade = F.floor((score + F.lit(1.0)) * F.lit(2.5)).cast("int")
    return {
        "mwl": mwl,
        "uniq_ratio": uniq,
        "stop_ratio": stop,
        "digit_ratio": digit,
        "score": score,
        "grade": grade,
    }
