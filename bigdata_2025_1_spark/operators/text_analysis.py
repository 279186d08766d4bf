"""Text-analysis operators for LLM-data pipelines (charter extension):
language ID, quality scoring, token counting, document fingerprinting.
All pure built-in column expressions (whole-stage codegen; embarrassingly
parallel — no shuffle except the final order-by, which a real pipeline
drops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.functions.exact import sql_int_avg
from bigdata_2025_1_spark.io import load, spread
from bigdata_2025_1_spark.registry import query

# DuckDB mirror of functions/text.py lang_id: score = count of tokens in
# the marker list; argmax with fixed language order, strict > to win.
_LANG_CASES = []
for _lang, _markers in T.LANG_MARKERS.items():
    _lst = ", ".join(f"'{m}'" for m in _markers)
    _LANG_CASES.append(
        f"len(list_filter(toks, t -> list_contains([{_lst}], t))) AS score_{_lang}"
    )
_LANG_SCORES_SQL = ",\n             ".join(_LANG_CASES)
# Spark's fold keeps the FIRST language (declaration order) that attains
# the max score: language L wins iff score_L > 0, strictly beats every
# EARLIER language (ties keep the earlier crown), and is >= every LATER one.
_ARGMAX_SQL = "CASE"
_langs = list(T.LANG_MARKERS)
for _i, _lang in enumerate(_langs):
    _conds = (
        [f"score_{_lang} > 0"]
        + [f"score_{_lang} > score_{p}" for p in _langs[:_i]]
        + [f"score_{_lang} >= score_{q}" for q in _langs[_i + 1 :]]
    )
    _ARGMAX_SQL += f" WHEN {' AND '.join(_conds)} THEN '{_lang}'"
_ARGMAX_SQL += " ELSE 'und' END"


@query(
    "lang_id_heuristic",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             {_LANG_SCORES_SQL}
      FROM tok
    )
    SELECT doc_id, lang AS labeled_lang,
           {_ARGMAX_SQL} AS detected_lang
    FROM scored
    ORDER BY doc_id
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (deterministic argmax over per-language
    hit counts; 'und' when nothing scores). The fixture text is synthetic,
    so most rows are 'und'/'en' — the operator shape is what matters."""
    docs = spread(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_id(F.col("text")).alias("detected_lang"),
    ).orderBy("doc_id")


@query(
    "doc_quality_scores",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS n_tokens,
             LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
             LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CASE WHEN n_chars > 0 THEN CAST(alpha AS DOUBLE) / n_chars END AS alpha_ratio,
           CASE WHEN n_chars > 0 THEN CAST(digits AS DOUBLE) / n_chars END AS digit_ratio,
           CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars END AS punct_ratio,
           CASE WHEN n_tokens > 0 THEN CAST(alpha AS DOUBLE) / n_tokens END AS mean_word_len
    FROM feat
    ORDER BY doc_id
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality signals (C4/Gopher style): char/token counts, alpha /
    digit / punct ratios, mean word length. Single-division doubles —
    deterministic cross-engine."""
    docs = load(spark, sf_dir, "documents")
    q = T.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["alpha_ratio"].alias("alpha_ratio"),
        q["digit_ratio"].alias("digit_ratio"),
        q["punct_ratio"].alias("punct_ratio"),
        q["mean_word_len"].alias("mean_word_len"),
    ).orderBy("doc_id")


@query(
    "token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS BIGINT)
             AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
             AS bpe_ish_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish
    pre-tokenizer regex (words | number runs | single symbols)."""
    docs = spread(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.size(T.ws_tokens(F.col("text"))).cast("bigint").alias("ws_tokens"),
        T.bpe_ish_token_count(F.col("text")).cast("bigint").alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


@query(
    "doc_fingerprints",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS shingles
      FROM tok
    )
    SELECT doc_id,
           list_min([md5(s) for s in shingles]) AS fingerprint
    FROM sh
    ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-md5 over 3-word shingles (1-hash MinHash;
    stable under block reordering). md5 hex strings order identically in
    Spark and DuckDB — no hex→int cast needed."""
    docs = spread(load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.doc_fingerprint(F.col("text"), k=3).alias("fingerprint"),
    ).orderBy("doc_id")


REP_THRESHOLD = 0.18


@query(
    "doc_ngram_repetition",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest([array_to_string(toks[i:i+1], ' ')
                     for i in range(1, greatest(len(toks) - 1, 0) + 1)]) AS bigram
      FROM tok
    ), cnt AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram
    ), agg AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(MAX(c) AS BIGINT) AS top_count
      FROM cnt GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(a.n_bigrams, 0) AS n_bigrams,
           COALESCE(a.top_count, 0) AS top_count,
           CASE WHEN a.n_bigrams > 0
                THEN a.top_count::DOUBLE / a.n_bigrams END AS rep_ratio,
           COALESCE(a.top_count::DOUBLE / a.n_bigrams <= {REP_THRESHOLD}, TRUE)
             AS keep
    FROM tok t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def doc_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: the fraction of all bigrams taken
    by the single most frequent bigram; docs above the threshold are
    template/boilerplate suspects. Single-division double (exact both
    engines); docs with <2 tokens keep=TRUE with NULL ratio.

    Scale: explode → two hash aggs keyed on (doc_id[, bigram]) — fully
    map-side-combinable, no windows, no joins except the final left join
    back to short docs."""
    docs = spread(load(spark, sf_dir, "documents"))
    toks = T.ws_tokens(F.lower(F.col("text")))
    n = F.size(toks)
    take = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, take),
        F.slice(toks, 2, take),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = docs.select("doc_id", F.explode(bigrams).alias("bigram"))
    cnt = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_count")
    )
    ratio = F.col("top_count").cast("double") / F.col("n_bigrams")
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("top_count"), F.lit(0)).alias("top_count"),
            F.when(F.col("n_bigrams") > 0, ratio).alias("rep_ratio"),
            F.coalesce(ratio <= REP_THRESHOLD, F.lit(True)).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query(
    "fuzzy_source_pairs",
    oracle="""
    WITH s AS (
      SELECT DISTINCT source FROM documents
      WHERE regexp_matches(source, '^[ -~]*$')
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(levenshtein(a.source, b.source) AS INT) AS edit_distance
    FROM s a JOIN s b ON a.source < b.source
    WHERE levenshtein(a.source, b.source) <= 1
    ORDER BY source_a, source_b
    """,
)
def fuzzy_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching over the source dictionary (the
    entity-resolution candidate pass: near-identical source labels are
    merge suspects). Levenshtein is the one string-similarity primitive
    the md5/minhash/simhash/Jaccard family doesn't cover.

    Cross-engine caveat, made part of the contract: Spark's levenshtein
    counts CHARACTERS while DuckDB's counts UTF-8 BYTES ('café' vs
    'cafe' = 1 vs 2), so both sides restrict to printable-ASCII labels
    (char == byte) with an explicit filter instead of silently diverging
    the day a non-ASCII label appears.

    Scale: the all-pairs comparison runs on the DISTINCT label
    dictionary, which is entity-count-sized (thousands), never
    corpus-sized — the aggregate-then-compare shape that keeps edit
    distance viable at 100 TB. For a large dictionary, band by length
    (|len_a - len_b| <= k prunes to an equi-joinable key) first."""
    docs = load(spark, sf_dir, "documents")
    s = (
        docs.filter(F.col("source").rlike("^[ -~]*$"))
        .select("source")
        .distinct()
    )
    a = s.select(F.col("source").alias("source_a"))
    b = s.select(F.col("source").alias("source_b"))
    dist = F.levenshtein("source_a", "source_b")
    return (
        a.join(b, F.col("source_a") < F.col("source_b"))
        .select("source_a", "source_b", dist.cast("int").alias("edit_distance"))
        .filter(F.col("edit_distance") <= 1)
        .orderBy("source_a", "source_b")
    )


@query(
    "argminmax_per_source",
    oracle="""
    SELECT source,
           CAST(arg_max(doc_id, n_chars * 10000000000 + doc_id) AS BIGINT)
             AS longest_doc,
           CAST(arg_min(doc_id, n_chars * 10000000000 + doc_id) AS BIGINT)
             AS shortest_doc,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def argminmax_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min aggregates (max_by/min_by — "which row holds the
    extreme", without a window or self-join): longest and shortest doc
    per source in ONE map-side-combinable hash aggregate.

    Tie-proofing: both engines pick an ARBITRARY row among ties, so the
    ordering key packs (n_chars, doc_id) into one integer —
    n_chars·10^10 + doc_id, exact lexicographic order while doc_id <
    10^10 (any realistic id; ANSI mode fails loudly on int64 overflow
    rather than silently mis-ranking). This is the scale-friendly
    alternative to the row_number window when only the extreme row is
    needed (no sort, no shuffle beyond the agg)."""
    docs = load(spark, sf_dir, "documents")
    key = F.col("n_chars") * F.lit(10_000_000_000) + F.col("doc_id")
    return (
        docs.groupBy("source")
        .agg(
            F.max_by("doc_id", key).cast("bigint").alias("longest_doc"),
            F.min_by("doc_id", key).cast("bigint").alias("shortest_doc"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
        )
        .orderBy("source")
    )
