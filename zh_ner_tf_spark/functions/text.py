"""Text-analysis column functions for the training-data pipeline:
language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting. All JVM-side expressions (whole-stage codegen);
no UDFs — these run inside the pages scan projection at 100 TB, so they
must be free.

Not in the reference (it assumes a clean single-language corpus); mandated
by the graft brief ("operations a large-scale training-data pipeline would
need").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.functions.hashing import poly_hash

# Frozen, tiny stopword inventories — enough for a deterministic n-gram/
# stopword heuristic; real deployments would broadcast a fastText-style
# table, same plumbing.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
    "es": ["el", "los", "las", "y"],
}
CJK_RANGE = "[\\u4e00-\\u9fff]"
STOPWORDS = ["the", "a", "of", "and"]


def padded_text(text: Column) -> Column:
    """The doubled-space, space-bracketed copy of ``text`` that whole-
    word counting splits against. Counting N tokens evaluates this once
    per token if inlined; hoist it into its OWN projection (a
    ``withColumn`` the optimizer cannot collapse away — CollapseProject
    keeps multi-referenced non-cheap aliases) so the full-text-sized
    string is materialized once per row, not once per token. At 100 TB
    that is ~20x less transient string bandwidth in the hottest scan
    projection."""
    return F.concat(F.lit(" "), F.regexp_replace(text, " ", "  "), F.lit(" "))


def _count_in_padded(padded: Column, tok: str) -> Column:
    # Whole-word occurrence count, INCLUDING adjacent repeats ("of of of"
    # counts 3): every space is doubled in `padded` so neighbouring
    # occurrences no longer share a delimiter; count non-overlapping
    # " tok " splits. (A lookaround regex would also work engine-side,
    # but DuckDB's RE2 oracle has no lookarounds — this form is
    # expressible identically in both dialects; see _count_tok_sql in
    # __spark_entry__.py.)
    return (F.size(F.split(padded, f" {tok} ")) - 1).cast("bigint")


def _count_token(text: Column, tok: str) -> Column:
    # One-off form; for counting many tokens hoist padded_text() first.
    return _count_in_padded(padded_text(text), tok)


def lang_id(text: Column, padded: Column | None = None) -> Column:
    """Deterministic language guess: CJK chars -> zh; else the marker
    inventory with the highest whole-word hit count (ties broken by
    alphabetical lang order); no hits -> 'und'. Pass ``padded`` (a
    hoisted ``padded_text(text)`` column) to share one padded copy
    across all marker counts."""
    if padded is None:
        padded = padded_text(text)
    zh = F.regexp_count(text, F.lit(CJK_RANGE)) > 0
    scores = [
        (
            lang,
            sum(
                (_count_in_padded(padded, t) for t in toks),
                F.lit(0).cast("bigint"),
            ),
        )
        for lang, toks in sorted(LANG_MARKERS.items())
    ]
    best_score = None
    best_lang = F.lit("und")
    for lang, score in scores:
        if best_score is None:
            best_score, best_lang = score, F.when(score > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            better = score > best_score
            best_lang = F.when(better & (score > 0), F.lit(lang)).otherwise(best_lang)
            best_score = F.when(better, score).otherwise(best_score)
    return F.when(zh, F.lit("zh")).otherwise(best_lang)


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    return F.size(F.filter(F.split(F.trim(text), "\\s+"), lambda t: t != "")).cast(
        "bigint"
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token count: alnum runs and each punct char count as one
    token (regex segmentation — an upper-bound proxy for BPE length)."""
    return F.regexp_count(text, F.lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")).cast("bigint")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic quality columns: n_chars_m, n_tokens,
    avg_token_len, stopword_ratio, punct_ratio, quality_score (all
    rounded for cross-engine stability)."""
    if "_padded_qf" in df.columns:
        raise ValueError(
            "input column '_padded_qf' collides with quality_features' "
            "internal hoisted projection; rename it"
        )
    t = F.col(text_col)
    # hoisted projection: one padded copy per row shared by all
    # stopword counts (see padded_text docstring)
    df = df.withColumn("_padded_qf", padded_text(t))
    n_tokens = token_count_ws(t)
    n_chars = F.length(t).cast("bigint")
    stop_hits = sum(
        (_count_in_padded(F.col("_padded_qf"), s) for s in STOPWORDS),
        F.lit(0).cast("bigint"),
    )
    punct = F.regexp_count(t, F.lit("[^A-Za-z0-9\\s\\u4e00-\\u9fff]")).cast("bigint")
    avg_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_tok >= 2.0) & (avg_tok <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 2).alias("quality_score"),
    ).drop("_padded_qf")


def doc_fingerprint(text: Column, k: int = 3) -> Column:
    """Rolling-hash document fingerprint: polynomial hash of the full
    text (cheap, exact-dup-stable) — the per-shingle winnowing variant
    lives in operators/dedup.py."""
    _ = k
    return poly_hash(text)


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column) -> Column:
    """ASCII-ONLY lowercase via translate — the frozen case rule for
    every oracle-gated tokenizer. Full Unicode lower() is NOT
    engine-invariant (Spark uses Java full case mapping — U+0130
    'İ' -> 'i' + combining dot — while DuckDB's utf8proc does simple
    codepoint mapping -> 'i'), so an oracle pair built on lower()
    silently diverges on real cased non-ASCII crawl text (review
    finding r8). translate over the 26 ASCII letters is bit-identical
    on both engines and leaves every other codepoint untouched."""
    return F.translate(col, _ASCII_UPPER, _ASCII_LOWER)


# the DuckDB twin of ascii_lower, for oracle SQL builders
ASCII_LOWER_SQL = f"translate({{col}}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


def tokenize_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term) rows: ASCII-lowercased whitespace tokens, empties
    dropped — the frozen tokenizer BM25 and token_surprisal share and
    their DuckDB oracles replicate exactly (string_split_regex +
    translate)."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.split(ascii_lower(F.col(text_col)), r"\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def token_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-unigram-LM surprisal per document — the model-based
    quality signal beside the rule-based quality_features: a document's
    average per-token surprisal under the corpus's own unigram language
    model,

        surprisal(d) = (1/|d|) * sum over token occurrences t of
                       ln( T / c(t) )

    where c(t) is the corpus occurrence count and T the corpus token
    total (maximum-likelihood unigram LM; every scored token is in the
    vocabulary by construction, so no smoothing term is needed). LOW
    surprisal = boilerplate / repetitive text; HIGH = rare-token-dense
    (often gibberish, OCR noise, or genuinely information-rich text) —
    both tails are the standard pretraining-corpus triage cuts.

    Tokenizer: ASCII-lowercased whitespace split (tokenize_docs above —
    shared with BM25, replicated exactly by the DuckDB oracle).
    Returns (id_col, n_tokens, surprisal) for every document with >= 1
    token; surprisal is raw (callers round at comparison boundaries).

    Scale shape (100 TB): per-(doc, term) tf and the corpus term census
    are map-side-combinable groupBys; the scoring join is tf ⋈ census
    on the term key (census is vocabulary-sized — the planner
    broadcasts it while it fits, and the join stays a bounded-fan-out
    equi join when it does not); T rides a 1-row broadcast. One
    corpus-keyed shuffle for the final per-doc sum."""
    toks = tokenize_docs(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("_tf"))
    census = tf.groupBy("term").agg(F.sum("_tf").alias("_c"))
    total = census.agg(F.sum("_c").alias("_t"))
    return (
        tf.join(census, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("_tf").alias("n_tokens"),
            (
                F.sum(F.col("_tf") * F.log(F.col("_t") / F.col("_c")))
                / F.sum("_tf")
            ).alias("surprisal"),
        )
    )
