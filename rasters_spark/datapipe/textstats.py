"""Text analysis for training-data pipelines — all pure SQL.

Language-ID (marker-word scoring), quality metrics (length / token /
punctuation ratios), token counting (whitespace + word-regex), and
document fingerprinting (polynomial rolling hash over char codes via
a sequential HOF fold). Every formula here is expressible identically
in DuckDB, so each operator carries a full value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker words per language for the n-gram/stopword heuristic — scored by
# substring occurrence counts; deterministic and engine-portable
LANG_MARKERS = {
    "en": ["the", "and", "value", "fast"],
    "de": ["und", "der", "das", "nicht"],
    "fr": ["le", "la", "les", "des"],
    "es": ["el", "los", "una", "por"],
    "zh": ["zh", "shi", "de", "le"],
}
MOD_P = 1_000_000_007


def _occurrences(text, word):
    """Count of ' word ' occurrences via length arithmetic — identical
    semantics on every SQL engine (no regex dialect differences)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))) / len(needle)


def doc_stats(docs: DataFrame) -> DataFrame:
    """Quality metrics per document → (doc_id, n_chars, n_tokens,
    avg_token_len, n_distinct_tokens, ttr). ttr = type-token ratio."""
    t = F.col("text")
    toks = F.split(t, " ")
    n_tokens = F.size(F.filter(toks, lambda x: F.length(x) > 0))
    n_distinct = F.size(F.array_distinct(F.filter(toks, lambda x: F.length(x) > 0)))
    n_spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        ((F.length(t) - n_spaces).cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct.cast("double") / n_tokens.cast("double")).alias("ttr"),
    )


#: BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct splits
#: with the leading-space convention), restricted to constructs both
#: Java regex (Spark) and RE2 (DuckDB) evaluate identically: no
#: lookaheads, ASCII classes, left-to-right alternation.
BPE_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting both ways the brief names: whitespace tokens AND
    BPE-ish regex pieces (the pre-tokenization granularity an LLM data
    pipeline budgets by) → (doc_id, n_ws_tokens, n_bpe_tokens,
    chars_per_bpe). The pattern string is shared verbatim with the
    DuckDB oracle (regexp_extract_all on both engines)."""
    t = F.col("text")
    toks = F.split(t, " ")
    n_ws = F.size(F.filter(toks, lambda x: F.length(x) > 0))
    n_bpe = F.size(F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)"))
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.length(t).cast("double") / n_bpe.cast("double")).alias("chars_per_bpe"),
    )


def langid(docs: DataFrame) -> DataFrame:
    """Marker-word language scoring → (doc_id, lang, predicted_lang,
    score). Ties broken by fixed language order."""
    t = F.col("text")
    scores = [(lang, sum([_occurrences(t, w) for w in ws], F.lit(0.0))) for lang, ws in LANG_MARKERS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("unknown")
    for lang, s in reversed(scores):
        pred = F.when(s == best_score, F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", "lang", pred.alias("predicted_lang"), best_score.alias("score"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Polynomial rolling hash over character codes:
    h = fold(h·31 + ascii(c)) mod 1e9+7 — sequential HOF, exact int64
    math, byte-identical across engines. → (doc_id, fp)."""
    t = F.col("text")
    codes = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.ascii(t.substr(i, F.lit(1))).cast("long"),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % MOD_P,
    )
    return docs.select("doc_id", fp.alias("fp"))


def _ws_tokens(t):
    """Whitespace tokens, empties dropped — the tokenization every
    entry in this module shares (and the oracles replicate verbatim
    as string_split + list_filter)."""
    return F.filter(F.split(t, " "), lambda x: F.length(x) > 0)


def _word_ngrams(toks, n: int):
    """Word n-grams as space-joined strings. Spark ``sequence(a, b)``
    DESCENDS when a > b (CLAUDE.md gotcha), so short docs are guarded
    to an empty array instead of producing phantom reversed indices."""
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(0), F.size(toks) - n)).otherwise(
        F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))


def doc_repetition(docs: DataFrame, n: int = 2) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 — the
    duplicate/top n-gram fractions used to filter repetitive text) per
    document over word ``n``-grams:

    ``(doc_id, n_grams, n_distinct, top_cnt, dup_frac, top_frac)``
    where dup_frac = (n_grams − n_distinct)/n_grams and top_frac =
    top_cnt/n_grams. Docs with fewer than ``n`` tokens emit nothing.

    Scale shape: scan-side explode → two keyed aggregations with
    map-side partial combine (the gram count then the per-doc fold) —
    the standard distributed frequency shape; nothing driver-side.
    Fractions are single divisions of exact int64 counts, so doubles
    hash identically cross-engine."""
    toks = _ws_tokens(F.col("text"))
    g = docs.select("doc_id", F.explode(_word_ngrams(toks, n)).alias("gram"))
    cnt = g.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_cnt"),
    ).select(
        "doc_id", "n_grams", "n_distinct", "top_cnt",
        ((F.col("n_grams") - F.col("n_distinct")).cast("double")
         / F.col("n_grams").cast("double")).alias("dup_frac"),
        (F.col("top_cnt").cast("double")
         / F.col("n_grams").cast("double")).alias("top_frac"),
    )


def decontaminate(docs: DataFrame, eval_docs: DataFrame = None, n: int = 5,
                  eval_grams: DataFrame = None) -> DataFrame:
    """Test-set decontamination by word n-gram overlap (the GPT-3
    appendix-C / Dolma protocol, at n=5 here because the synthetic
    docs are short; production uses 13-grams): a training doc is
    contaminated when it shares an n-gram with any eval doc →
    ``(doc_id, n_overlap_grams, n_overlap_instances)`` for
    contaminated docs only (distinct shared grams, and how many gram
    occurrences they cover).

    Grams join on md5 digests — at 100 TB the digest table is what
    you'd persist and bucket (pass it back in via ``eval_grams`` to
    skip recomputation — the streaming variant does); md5 of
    equal strings is equal on both engines, so the oracle joins the
    same digests. Scale shape: scan-side explode on BOTH sides, one
    distinct on the (smaller) eval side, one hash join, one keyed
    agg — no driver-side collection."""
    def grams(df):
        toks = _ws_tokens(F.col("text"))
        return df.select(
            "doc_id",
            F.explode(_word_ngrams(toks, n)).alias("gram"),
        ).select("doc_id", F.md5(F.col("gram")).alias("g"))

    if eval_grams is None:
        eval_grams = grams(eval_docs).select("g").distinct()
    ev = eval_grams
    tr = grams(docs)
    hit = tr.join(ev, "g")
    return hit.groupBy("doc_id").agg(
        F.count_distinct("g").alias("n_overlap_grams"),
        F.count("*").alias("n_overlap_instances"),
    )


def quality_filter(docs: DataFrame, min_tokens: int = 16,
                   max_dup_frac: float = 0.05,
                   max_top_frac: float = 0.1) -> DataFrame:
    """The pipeline GATING step — combine the quality signals into a
    keep/drop verdict with a deterministic reason code (the
    Gopher/C4-style rule cascade, Rae 2021 table A1): first failing
    rule wins, precedence too_short → repetitive → top_heavy.
    → (doc_id, n_tokens, dup_frac, top_frac, keep, reason).

    Every signal is an exact-int count or a single division of exact
    int64 counts, so the threshold comparisons — and therefore the
    verdicts — are bit-identical cross-engine. Scan-side + the two
    repetition aggs; one broadcastable join on doc_id."""
    toks = _ws_tokens(F.col("text"))
    st = docs.select("doc_id", F.size(toks).alias("n_tokens"))
    rep = doc_repetition(docs, 2).select("doc_id", "dup_frac", "top_frac")
    j = (st.join(rep, "doc_id", "left")
         .withColumn("dup_frac", F.coalesce("dup_frac", F.lit(0.0)))
         .withColumn("top_frac", F.coalesce("top_frac", F.lit(0.0))))
    reason = (F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
              .when(F.col("dup_frac") > max_dup_frac, F.lit("repetitive"))
              .when(F.col("top_frac") > max_top_frac, F.lit("top_heavy")))
    return j.select("doc_id", "n_tokens", "dup_frac", "top_frac",
                    reason.isNull().alias("keep"), reason.alias("reason"))


def source_quality(docs: DataFrame, **thresholds) -> DataFrame:
    """Per-source corpus health report — the monitoring face of
    ``quality_filter``: group the verdicts by the ``source`` column →
    (source, n_docs, n_keep, keep_rate, n_too_short, n_repetitive,
    n_top_heavy). keep_rate is one division of exact int64 counts."""
    v = quality_filter(docs, **thresholds).join(
        docs.select("doc_id", "source"), "doc_id")
    return (v.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.count(F.when(F.col("keep"), 1)).alias("n_keep"),
                 F.count(F.when(F.col("reason") == "too_short", 1)).alias("n_too_short"),
                 F.count(F.when(F.col("reason") == "repetitive", 1)).alias("n_repetitive"),
                 F.count(F.when(F.col("reason") == "top_heavy", 1)).alias("n_top_heavy"))
            .select("source", "n_docs", "n_keep",
                    (F.col("n_keep").cast("double")
                     / F.col("n_docs").cast("double")).alias("keep_rate"),
                    "n_too_short", "n_repetitive", "n_top_heavy"))
