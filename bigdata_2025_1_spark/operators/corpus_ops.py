"""Corpus-hygiene operators a pretraining pipeline runs before tokenizer
and model ever see the data: cross-document duplicated-span detection
(the Lee et al. 2022 "deduplicating training data" signal — the fixture
text has no newlines, so the C4 line-dedup shape appears at its honest
granularity: repeated word n-gram spans), and one BPE merge step (the
pair-frequency scan at the core of tokenizer training).

Scale notes are per-query; both avoid any all-pairs work — spans/pairs
are grouped by their own value (an equi-key shuffle of small strings),
never compared pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.functions.ranks import (
    boundary_rank_keep,
    cum_counts_over_values,
    rank_after_limit,
)
from bigdata_2025_1_spark.io import load, spread
from bigdata_2025_1_spark.registry import query

SPAN_K = 8  # words per span: long enough that sharing one is signal

_SQL_TOKS = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"
_SQL_SPANS = (
    f"list_distinct([array_to_string(toks[i:i+{SPAN_K - 1}], ' ') "
    f"for i in range(1, greatest(len(toks) - {SPAN_K - 1}, 0) + 1)])"
)


@query(
    "corpus_duplicate_spans",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, md5(unnest(spans)) AS h
      FROM (SELECT doc_id, {_SQL_SPANS} AS spans
            FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents))
    ), freq AS (
      SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM ex GROUP BY h
    ), per_doc AS (
      SELECT e.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
      FROM ex e JOIN freq f USING (h)
      GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
           10 * COALESCE(p.n_dup_spans, 0) > 3 * COALESCE(p.n_spans, 0) AS dup_heavy
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
    """,
)
def corpus_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span detection: for every document, how
    many of its distinct 8-word spans also occur in at least one OTHER
    document, and a >30% "dup-heavy" flag — the span-level dedup signal
    (Lee et al. 2022) that catches boilerplate exact-dedup misses and
    MinHash dilutes.

    Scale shape: spans are md5'd to fixed-width keys IN BOTH ENGINES
    before any shuffle (the exact-dedup trick, operators/dedup.py:63 —
    the wire carries hashes, not 50-char strings), then grouped BY THEIR
    OWN VALUE (hash → distinct-doc count) — an equi-key aggregation,
    never a doc-pair comparison, so cost is O(corpus spans), not
    O(docs²). The exploded span table is persisted because it feeds both
    the frequency aggregation and the per-doc join-back — one
    tokenization pass total (the doc spine for the final left join comes
    from the raw table, no re-shingling). The >30% flag is integer-exact
    (10·dup > 3·total). Zero-span docs (shorter than 8 words) surface
    with (0, 0, false) via the left join, not silently dropped."""
    docs = load(spark, sf_dir, "documents")
    ex = (
        spread(docs)
        .select("doc_id", F.explode(T.word_shingles(F.col("text"), k=SPAN_K)).alias("span"))
        .select("doc_id", F.md5("span").alias("h"))
        .persist()
    )
    freq = ex.groupBy("h").agg(F.count_distinct("doc_id").alias("n_docs"))
    per_doc = (
        ex.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("p_spans"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("p_dup"),
        )
    )
    n_dup = F.coalesce(F.col("p_dup"), F.lit(0))
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("p_spans"), F.lit(0)).alias("n_spans"),
            n_dup.alias("n_dup_spans"),
            (10 * n_dup > 3 * F.coalesce(F.col("p_spans"), F.lit(0))).alias("dup_heavy"),
        )
        .orderBy("doc_id")
    )


@query(
    "bpe_pair_merge_step",
    oracle="""
    WITH words AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                    t -> t <> '')) AS w
      FROM documents
    ), pairs AS (
      SELECT unnest([substr(w, i, 2) for i in range(1, length(w))]) AS pair
      FROM words
      WHERE length(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def bpe_pair_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge step's frequency scan: count adjacent CHARACTER
    pairs inside words across the corpus and rank the merge candidates —
    the inner loop of byte-pair-encoding tokenizer training (the top
    pair is the next merge; re-running after applying a merge is the
    full algorithm).

    Scale shape: pair extraction is a per-row higher-order expression
    (no UDF); the aggregation keys on the pair itself — at most
    |alphabet|² groups, so map-side combine collapses each partition to
    a tiny partial before one exchange (the same fixed-keyspace argument
    as the count-min cells). Top-20 with a total tiebreak on the pair
    string."""
    docs = spread(load(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(T.ws_tokens(F.lower(F.col("text")))).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


PMI_MIN_COUNT = 5
PMI_TOP_K = 20


@query(
    "pmi_token_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKS} AS ts FROM documents
    ), uni AS (
      SELECT unnest(ts) AS w FROM tok
    ), ucnt AS (
      SELECT w, COUNT(*) AS c FROM uni GROUP BY w
    ), nt AS (
      SELECT COUNT(*) AS n_tok FROM uni
    ), big AS (
      SELECT unnest([ts[i] || ' ' || ts[i + 1] for i in range(1, len(ts))]) AS bg
      FROM tok
    ), bcnt AS (
      SELECT bg, COUNT(*) AS c_ab FROM big GROUP BY bg
    ), nb AS (
      SELECT COUNT(*) AS n_big FROM big
    ), scored AS (
      SELECT split_part(bg, ' ', 1) AS tok_a, split_part(bg, ' ', 2) AS tok_b,
             c_ab,
             CAST(ROUND(ln(((((c_ab::DOUBLE * nt.n_tok) / ca.c) * nt.n_tok) / cb.c)
                           / nb.n_big) * 1e6) AS BIGINT) AS pmi_i6
      FROM bcnt
      JOIN ucnt ca ON ca.w = split_part(bg, ' ', 1)
      JOIN ucnt cb ON cb.w = split_part(bg, ' ', 2)
      CROSS JOIN nt CROSS JOIN nb
      WHERE c_ab >= {PMI_MIN_COUNT}
    )
    SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS pair_count,
           pmi_i6::DOUBLE / 1e6 AS pmi, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi_i6 DESC, tok_a, tok_b) AS rank
          FROM scored)
    WHERE rank <= {PMI_TOP_K}
    ORDER BY rank
    """,
)
def pmi_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of ADJACENT token bigrams — the
    phrase-detection pass (word2vec-style "new_york" promotion, also the
    collocation scan a tokenizer-prep pipeline runs): PMI(a,b) =
    ln(P(ab) / (P(a)·P(b))) with P from bigram/unigram counts, keeping
    bigrams seen ≥ 5 times, top 20 by PMI.

    Determinism: all counts are exact integers; the PMI argument is ONE
    fixed-order chain of double ops (×N, ÷c_a, ×N, ÷c_b, ÷N_big — no
    int-product overflow at any corpus size); ln rounds to 6 dp like
    tfidf/BM25, and ranking sorts the scaled int64 with a (tok_a, tok_b)
    tiebreak.

    Scale shape: two map-side-combinable counts (unigrams, bigrams —
    bigram enumeration is a per-row array transform, shuffle-free);
    unigram counts broadcast back onto the bigram aggregate (vocabulary
    ≪ corpus); the two corpus totals are 1-row broadcasts; top-k is
    TakeOrdered. Nothing in the plan scales superlinearly with tokens."""
    docs = spread(load(spark, sf_dir, "documents"))
    toks = docs.select(T.ws_tokens(F.lower(F.col("text"))).alias("ts"))
    uni = toks.select(F.explode("ts").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    nt = uni.agg(F.count("*").alias("n_tok"))
    ts = F.col("ts")
    idx = F.when(F.size(ts) >= 2, F.sequence(F.lit(1), F.size(ts) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bg = F.transform(
        idx,
        lambda i: F.concat(F.element_at(ts, i), F.lit(" "), F.element_at(ts, i + 1)),
    )
    big = toks.select(F.explode(bg).alias("bg"))
    bcnt = big.groupBy("bg").agg(F.count("*").alias("c_ab"))
    nb = big.agg(F.count("*").alias("n_big"))
    ca = ucnt.select(F.col("w").alias("wa"), F.col("c").alias("c_a"))
    cb = ucnt.select(F.col("w").alias("wb"), F.col("c").alias("c_b"))
    pmi_arg = (
        (
            (F.col("c_ab").cast("double") * F.col("n_tok") / F.col("c_a"))
            * F.col("n_tok")
            / F.col("c_b")
        )
        / F.col("n_big")
    )
    scored = (
        bcnt.filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(F.broadcast(ca), F.split_part(F.col("bg"), F.lit(" "), F.lit(1)) == F.col("wa"))
        .join(F.broadcast(cb), F.split_part(F.col("bg"), F.lit(" "), F.lit(2)) == F.col("wb"))
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("wa").alias("tok_a"),
            F.col("wb").alias("tok_b"),
            "c_ab",
            F.round(F.log(pmi_arg) * F.lit(1e6)).cast("bigint").alias("pmi_i6"),
        )
    )
    return (
        rank_after_limit(
            scored, [F.desc("pmi_i6"), F.col("tok_a"), F.col("tok_b")], PMI_TOP_K
        )
        .select(
            "tok_a",
            "tok_b",
            F.col("c_ab").alias("pair_count"),
            (F.col("pmi_i6").cast("double") / F.lit(1e6)).alias("pmi"),
            "rank",
        )
        .orderBy("rank")
    )


VOCAB_BUCKET_DOCS = 50


@query(
    "vocab_growth_curve",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ), per_doc AS (
      SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id
    ), first_seen AS (
      SELECT w, MIN(doc_id) AS fdoc FROM tok GROUP BY w
    ), new_per_doc AS (
      SELECT fdoc AS doc_id, COUNT(*) AS new_words FROM first_seen GROUP BY fdoc
    ), buckets AS (
      SELECT p.doc_id // {VOCAB_BUCKET_DOCS} AS bucket,
             SUM(p.n_tok) AS toks,
             SUM(COALESCE(n.new_words, 0)) AS vocab,
             COUNT(*) AS docs
      FROM per_doc p LEFT JOIN new_per_doc n USING (doc_id)
      GROUP BY bucket
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(docs) OVER w AS BIGINT) AS docs_seen,
           CAST(SUM(toks) OVER w AS BIGINT) AS tokens_seen,
           CAST(SUM(vocab) OVER w AS BIGINT) AS vocab_size
    FROM buckets
    WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY bucket
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law measurement): cumulative
    distinct-word count as the corpus is consumed in doc_id order,
    bucketed every 50 documents, alongside cumulative token counts —
    the diagnostic a tokenizer-training / dedup pipeline reads to see
    whether a corpus is still contributing novelty or has gone stale.

    The cumulative-distinct trick: a word contributes exactly once, AT
    its first-occurrence document (min doc_id per word) — so "distinct
    so far" becomes a plain cumulative SUM of per-doc first-occurrence
    counts. No quadratic re-scan, no stateful loop.

    Scale shape: two map-side-combinable aggregates (per-doc token
    counts; min-doc per word — the only vocabulary-keyed shuffle), one
    bucket rollup, and a cumulative window over the BUCKET table
    (corpus_size / 50 rows). All integers."""
    docs = spread(load(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(T.ws_tokens(F.lower(F.col("text")))).alias("w"))
    per_doc = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    first_seen = tok.groupBy("w").agg(F.min("doc_id").alias("doc_id"))
    new_per_doc = first_seen.groupBy("doc_id").agg(F.count("*").alias("new_words"))
    buckets = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .groupBy(F.expr(f"doc_id div {VOCAB_BUCKET_DOCS}").alias("bucket"))
        .agg(
            F.sum("n_tok").alias("toks"),
            F.sum(F.coalesce(F.col("new_words"), F.lit(0))).alias("vocab"),
            F.count("*").alias("docs"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return buckets.select(
        "bucket",
        F.sum("docs").over(w).alias("docs_seen"),
        F.sum("toks").over(w).alias("tokens_seen"),
        F.sum("vocab").over(w).alias("vocab_size"),
    ).orderBy("bucket")


CUR2_MIN_TOKENS = 20
CUR2_NLL_KEEP_PCT = 90  # keep the least-surprising 90% by unigram NLL


@query(
    "corpus_curation_v2",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, {_SQL_TOKS} AS ts FROM documents
    ), kept_len AS (
      SELECT doc_id, source, len(ts) AS n_tokens FROM tok
      WHERE len(ts) >= {CUR2_MIN_TOKENS}
    ), exact_keep AS (
      SELECT k.doc_id, k.source, k.n_tokens FROM kept_len k
      JOIN (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
            FROM documents) e
        ON e.doc_id = k.doc_id AND e.doc_id = e.keeper
    ), sh2 AS (
      SELECT t.doc_id,
             list_distinct([array_to_string(t.ts[i:i+2], ' ')
                            for i in range(1, greatest(len(t.ts) - 2, 0) + 1)]) AS grams,
             len(list_distinct([array_to_string(t.ts[i:i+2], ' ')
                                for i in range(1, greatest(len(t.ts) - 2, 0) + 1)])) AS sz
      FROM tok t JOIN exact_keep USING (doc_id)
      WHERE len(t.ts) >= 3
    ), posts AS (
      SELECT doc_id, sz, unnest(grams) AS g FROM sh2
    ), gdf AS (
      SELECT g, COUNT(*) AS df FROM posts GROUP BY g
    ), rarest AS (
      SELECT doc_id, g, sz FROM (
        SELECT p.doc_id, p.g, p.sz,
               ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY d.df, p.g) AS rk
        FROM posts p JOIN gdf d USING (g)) WHERE rk = 1
    ), contained AS (
      SELECT DISTINCT r.doc_id
      FROM rarest r
      JOIN posts p USING (g)
      JOIN sh2 sa ON sa.doc_id = r.doc_id
      JOIN sh2 sb ON sb.doc_id = p.doc_id
      WHERE r.doc_id <> p.doc_id
        AND (r.sz < p.sz OR (r.sz = p.sz AND r.doc_id < p.doc_id))
        AND len(list_intersect(sa.grams, sb.grams)) * 10 >= 8 * sa.sz
    ), deduped AS (
      SELECT e.* FROM exact_keep e
      LEFT JOIN contained c USING (doc_id)
      WHERE c.doc_id IS NULL
    ), uni AS (
      SELECT doc_id, unnest(ts) AS w FROM tok
    ), ucnt AS (
      SELECT w, COUNT(*) AS c FROM uni GROUP BY w
    ), nt AS (
      SELECT COUNT(*) AS n_tok FROM uni
    ), lp AS (
      SELECT w, CAST(ROUND(ln(c::DOUBLE / n_tok) * 1e6) AS BIGINT) AS l_i6
      FROM ucnt CROSS JOIN nt
    ), nll AS (
      SELECT u.doc_id, -SUM(lp.l_i6) // COUNT(*) AS nll_i6
      FROM uni u JOIN lp ON lp.w = u.w GROUP BY u.doc_id
    ), q AS (
      SELECT d.doc_id, d.source, d.n_tokens,
             ROW_NUMBER() OVER (ORDER BY n.nll_i6, d.doc_id) AS nll_rank,
             COUNT(*) OVER () AS n_docs
      FROM deduped d JOIN nll n USING (doc_id)
    ), final AS (
      SELECT doc_id, source, n_tokens FROM q
      WHERE nll_rank * 100 <= {CUR2_NLL_KEEP_PCT} * n_docs
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(k.doc_id) AS BIGINT) AS n_after_len,
           CAST(COUNT(dd.doc_id) AS BIGINT) AS n_after_dedup,
           CAST(COUNT(f.doc_id) AS BIGINT) AS n_final,
           CAST(COALESCE(SUM(f.n_tokens), 0) AS BIGINT) AS tokens_final
    FROM documents d
    LEFT JOIN kept_len k ON k.doc_id = d.doc_id
    LEFT JOIN deduped dd ON dd.doc_id = d.doc_id
    LEFT JOIN final f ON f.doc_id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def corpus_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 curation capstone, composing the NEW operator families in
    ONE lazy plan: (1) token-count floor; (2) exact dedup (md5 keeper);
    (3) containment dedup — drop docs whose 3-word shingle set is >=80%
    inside a larger survivor (rare-shingle prefix-filter blocking,
    integer cross-multiplied threshold 10*|intersect| >= 8*|A|);
    (4) LM-surprise gate — keep the least-surprising 90% of the deduped
    pool by unigram NLL (rank-based integer percentile cut, no float
    threshold); then a per-source funnel report (raw -> length -> dedup
    -> final, with surviving token mass). Dedup runs BEFORE the LM gate
    so duplicate mass cannot skew the surprise distribution it is cut
    against; ``corpus_end_to_end`` is the round-2 capstone over the
    original families.

    Determinism: every stage filters on integers (token counts, rank
    cuts, containment cross-multiplication, int64 NLL millionths with
    floor-div per-doc mean); the report is pure counts.

    Scale shape: inherits each component's: one tokenization pass
    persisted for all stages, 16-byte exact-dedup keys, rare-shingle
    postings equi-join — candidates only, never all-pairs; broadcast
    vocabulary logprobs; the LM gate's percentile cut buckets the
    DISTINCT NLL value domain (equi_depth_price_deciles pattern — no
    doc-sized unpartitioned window, pinned in tests/test_plans.py); the
    funnel is LEFT JOINs of doc-keyed survivor sets aggregated map-side
    per source."""
    docs = spread(load(spark, sf_dir, "documents")).persist()
    toks = docs.select(
        "doc_id", "source", T.ws_tokens(F.lower(F.col("text"))).alias("ts")
    ).persist()
    kept_len = toks.select("doc_id", "source", F.size("ts").alias("n_tokens")).filter(
        F.col("n_tokens") >= CUR2_MIN_TOKENS
    )
    keeper = docs.select(
        "doc_id", F.min("doc_id").over(Window.partitionBy(F.md5("text"))).alias("keeper")
    )
    exact_keep = (
        kept_len.join(keeper, "doc_id")
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "source", "n_tokens")
    )
    sh2 = (
        toks.join(exact_keep.select("doc_id"), "doc_id")
        .select("doc_id", T.word_shingles_from_tokens(F.col("ts"), 3).alias("grams"))
        .withColumn("sz", F.size("grams"))
        .filter(F.col("sz") > 0)
        .persist()
    )
    posts = sh2.select("doc_id", "sz", F.explode("grams").alias("g"))
    gdf = posts.groupBy("g").agg(F.count("*").alias("df"))
    rarest = (
        posts.join(gdf, "g")
        .groupBy("doc_id")
        .agg(F.min(F.struct(F.col("df"), F.col("g"))).alias("r"), F.min("sz").alias("sz"))
        .select("doc_id", F.col("r.g").alias("g"), "sz")
    )
    r = rarest.select(F.col("doc_id").alias("doc_small"), "g", F.col("sz").alias("sz_a"))
    p = posts.select(F.col("doc_id").alias("doc_big"), "g", F.col("sz").alias("sz_b"))
    sa = sh2.select(F.col("doc_id").alias("doc_small"), F.col("grams").alias("ga"))
    sb = sh2.select(F.col("doc_id").alias("doc_big"), F.col("grams").alias("gb"))
    contained = (
        r.join(p, "g")
        .filter(
            (F.col("doc_small") != F.col("doc_big"))
            & (
                (F.col("sz_a") < F.col("sz_b"))
                | ((F.col("sz_a") == F.col("sz_b")) & (F.col("doc_small") < F.col("doc_big")))
            )
        )
        .join(sa, "doc_small")
        .join(sb, "doc_big")
        .filter(F.size(F.array_intersect("ga", "gb")) * 10 >= 8 * F.col("sz_a"))
        .select(F.col("doc_small").alias("doc_id"))
        .distinct()
    )
    # persisted: feeds the NLL gate (via dn) AND the final funnel join —
    # without it the whole containment-dedup pipeline above re-executes
    # once per consumer (measured 5.4 s -> 14.2 s at sf0.1 when the
    # round-5 gate rewrite added consumers without this persist)
    deduped = exact_keep.join(contained, "doc_id", "left_anti").persist()
    uni = toks.select("doc_id", F.explode("ts").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    nt = uni.agg(F.count("*").alias("n_tok"))
    lp = ucnt.crossJoin(F.broadcast(nt)).select(
        "w",
        F.round(F.log(F.col("c").cast("double") / F.col("n_tok")) * F.lit(1e6))
        .cast("bigint")
        .alias("l_i6"),
    )
    nll = (
        uni.join(F.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(F.expr("-SUM(l_i6) div COUNT(*)").alias("nll_i6"))
    )
    # Percentile gate via distinct-value cum-count bucketing (the
    # equi_depth_price_deciles pattern): rank cut K = PCT*n div 100, a
    # doc with NLL value v and 1-based doc_id-order position j inside
    # its value group has global rank cum_before(v) + j, so groups with
    # cum_before+count <= K are kept whole, groups with cum_before >= K
    # dropped whole, and only the ONE boundary group needs a per-doc
    # window — partitioned by its value, never the full doc table. The
    # only unpartitioned window runs over the DISTINCT NLL domain
    # (bounded by the integer-millionths score range, not by corpus
    # size).
    # persisted: three consumers below (value histogram, total count,
    # the per-doc join) — narrow doc-sized rows
    dn = deduped.join(nll, "doc_id").persist()
    vals = dn.groupBy("nll_i6").agg(F.count("*").alias("vc"))
    cum = cum_counts_over_values(vals, "nll_i6")
    ntot = dn.agg(F.count("*").alias("n_docs"))
    cuts = cum.crossJoin(F.broadcast(ntot)).select(
        "nll_i6",
        "vc",
        "cum_before",
        F.expr(f"{CUR2_NLL_KEEP_PCT} * n_docs div 100").alias("kcut"),
    )
    joined = dn.join(cuts, "nll_i6")
    kept_full = joined.filter(F.col("cum_before") + F.col("vc") <= F.col("kcut"))
    boundary = joined.filter(
        (F.col("cum_before") < F.col("kcut")) & (F.col("cum_before") + F.col("vc") > F.col("kcut"))
    )
    kept_part = boundary_rank_keep(boundary, "doc_id", ["nll_i6"])
    final = (
        kept_full.select("doc_id", "n_tokens")
        .unionByName(kept_part.select("doc_id", "n_tokens"))
        .select("doc_id", F.col("n_tokens").alias("ft"))
    )
    base = docs.select("doc_id", "source")
    return (
        base.join(kept_len.select("doc_id", F.lit(1).alias("kl")), "doc_id", "left")
        .join(deduped.select("doc_id", F.lit(1).alias("dd")), "doc_id", "left")
        .join(final, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_raw"),
            F.count("kl").alias("n_after_len"),
            F.count("dd").alias("n_after_dedup"),
            F.count("ft").alias("n_final"),
            F.coalesce(F.sum("ft"), F.lit(0)).alias("tokens_final"),
        )
        .orderBy("source")
    )


SWEEP_KEEP_PCTS = (80, 85, 90, 95)


@query(
    "quality_threshold_sweep",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKS} AS ts FROM documents
    ), uni AS (
      SELECT doc_id, unnest(ts) AS w FROM tok
    ), ucnt AS (
      SELECT w, COUNT(*) AS c FROM uni GROUP BY w
    ), nt AS (
      SELECT COUNT(*) AS n_tok FROM uni
    ), lp AS (
      SELECT w, CAST(ROUND(ln(c::DOUBLE / n_tok) * 1e6) AS BIGINT) AS l_i6
      FROM ucnt CROSS JOIN nt
    ), feats AS (
      SELECT t.doc_id, len(t.ts) AS n_tokens, n.nll_i6
      FROM tok t JOIN (
        SELECT u.doc_id, -SUM(lp.l_i6) // COUNT(*) AS nll_i6
        FROM uni u JOIN lp ON lp.w = u.w GROUP BY u.doc_id
      ) n USING (doc_id)
    ), ranked AS (
      SELECT doc_id, n_tokens,
             ROW_NUMBER() OVER (ORDER BY nll_i6, doc_id) AS rk,
             COUNT(*) OVER () AS n
      FROM feats
    )
    SELECT * FROM (
      {" UNION ALL ".join(
        f'''SELECT {p} AS keep_pct,
                   CAST(SUM(CASE WHEN rk * 100 <= {p} * n THEN 1 ELSE 0 END) AS BIGINT)
                     AS docs_kept,
                   CAST(SUM(CASE WHEN rk * 100 <= {p} * n THEN n_tokens ELSE 0 END) AS BIGINT)
                     AS tokens_kept
            FROM ranked''' for p in SWEEP_KEEP_PCTS)}
    ) ORDER BY keep_pct
    """,
)
def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep for the LM-surprise quality gate: for each
    candidate keep-percentile (80/85/90/95), how many documents and how
    much token mass survive — the tuning table read before committing
    ``corpus_curation_v2``'s cut to a 100 TB run (each row is a
    candidate operating point; the cost is ONE rank pass, not one run
    per candidate).

    Determinism: NLL is the integer-millionths score shared with
    ``unigram_logprob_quality``; each operating point is an integer
    rank-cut conditional sum.

    Scale shape: NO doc-sized unpartitioned window (pinned in
    tests/test_plans.py). Docs collapse to per-NLL-value (count, token
    mass) aggregates; the cum-count window runs over the DISTINCT value
    domain (bounded by the integer-millionths score range); each
    operating point is then a conditional sum over that value table,
    plus a per-doc correction for the ONE boundary value group per cut
    (window partitioned by (keep_pct, value) — tiny partitions)."""
    docs = spread(load(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.ws_tokens(F.lower(F.col("text"))).alias("ts"))
    uni = toks.select("doc_id", F.explode("ts").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    nt = uni.agg(F.count("*").alias("n_tok"))
    lp = ucnt.crossJoin(F.broadcast(nt)).select(
        "w",
        F.round(F.log(F.col("c").cast("double") / F.col("n_tok")) * F.lit(1e6))
        .cast("bigint")
        .alias("l_i6"),
    )
    nll = (
        uni.join(F.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(F.expr("-SUM(l_i6) div COUNT(*)").alias("nll_i6"))
    )
    # persisted: the tokenize+NLL pipeline above feeds three consumers
    # (value histogram, total count, boundary-group docs)
    feats = (
        toks.select("doc_id", F.size("ts").alias("n_tokens"))
        .join(nll, "doc_id")
        .persist()
    )
    vals = feats.groupBy("nll_i6").agg(
        F.count("*").alias("vc"), F.sum("n_tokens").alias("vtok")
    )
    cum = cum_counts_over_values(vals, "nll_i6")
    ntot = feats.agg(F.count("*").alias("n"))
    pcts = spark.createDataFrame([(p,) for p in SWEEP_KEEP_PCTS], "keep_pct INT")
    kdf = pcts.crossJoin(F.broadcast(ntot)).select(
        "keep_pct", F.expr("keep_pct * n div 100").alias("kcut")
    )
    graded = cum.crossJoin(F.broadcast(kdf))
    # value groups entirely below each cut: whole-group sums suffice
    full = graded.groupBy("keep_pct").agg(
        F.sum(
            F.when(F.col("cum_before") + F.col("vc") <= F.col("kcut"), F.col("vc")).otherwise(0)
        ).alias("docs_full"),
        F.sum(
            F.when(F.col("cum_before") + F.col("vc") <= F.col("kcut"), F.col("vtok")).otherwise(0)
        ).alias("tok_full"),
    )
    # the one value group straddling each cut: count its first
    # (kcut - cum_before) docs in doc_id order — a window partitioned by
    # (keep_pct, value), at most one group per operating point
    bvals = graded.filter(
        (F.col("cum_before") < F.col("kcut")) & (F.col("cum_before") + F.col("vc") > F.col("kcut"))
    ).select("keep_pct", "nll_i6", "cum_before", "kcut")
    bdocs = feats.join(F.broadcast(bvals), "nll_i6")
    bkept = boundary_rank_keep(bdocs, "doc_id", ["keep_pct", "nll_i6"])
    bagg = bkept.groupBy("keep_pct").agg(
        F.count("*").alias("docs_b"), F.sum("n_tokens").alias("tok_b")
    )
    # one output row per operating point even on EMPTY input (SQL
    # aggregates-without-GROUP-BY emit a NULL-sum row; the grouped `full`
    # would emit none) — anchor on the always-4-row pcts table; the
    # NULL-propagating + keeps empty-input sums NULL exactly like the
    # oracle's SUM over zero rows
    return (
        pcts.join(full, "keep_pct", "left")
        .join(bagg, "keep_pct", "left")
        .select(
            "keep_pct",
            (F.col("docs_full") + F.coalesce(F.col("docs_b"), F.lit(0))).alias("docs_kept"),
            (F.col("tok_full") + F.coalesce(F.col("tok_b"), F.lit(0))).alias("tokens_kept"),
        )
        .orderBy("keep_pct")
    )


@query(
    "corpus_health_scorecard",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text, {_SQL_TOKS} AS ts FROM documents
    ), uni AS (
      SELECT unnest(ts) AS w FROM tok
    ), fp AS (
      SELECT doc_id,
             list_min([md5(g) for g in list_distinct(
               [array_to_string(ts[i:i+2], ' ')
                for i in range(1, greatest(len(ts) - 2, 0) + 1)])]) AS fp
      FROM tok WHERE len(ts) >= 3
    )
    SELECT CAST((SELECT COUNT(*) FROM tok) AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) - COUNT(DISTINCT text) FROM tok) AS BIGINT)
             AS n_exact_dups,
           CAST((SELECT COUNT(*) - COUNT(DISTINCT fp) FROM fp) AS BIGINT)
             AS n_fingerprint_collisions,
           CAST((SELECT COUNT(DISTINCT w) FROM uni) AS BIGINT) AS vocab_size,
           CAST((SELECT COUNT(*) FROM uni) AS BIGINT) AS total_tokens,
           (SELECT CAST(SUM(len(ts)) AS BIGINT)::DOUBLE / COUNT(*) FROM tok)
             AS avg_tokens
    """,
)
def corpus_health_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus scorecard — the executive summary a data-quality
    dashboard polls per snapshot: document count, exact-duplicate count,
    1-hash MinHash fingerprint collisions (the cheap near-dup upper
    signal — collisions ≥ true near-dup clusters), vocabulary size,
    token mass, and mean document length. Every number is a one-pass
    aggregate; trend it over snapshots and the derivative of each column
    is an alert.

    Determinism: counts and distincts are integers; the mean is one
    exact-int double division; the fingerprint is the md5-min shared
    with ``doc_fingerprints``.

    Scale shape: one tokenization feeding three map-side-combinable
    aggregates (docs, vocabulary, fingerprints), cross-joined as 1-row
    broadcasts — no joins of data-sized tables anywhere."""
    docs = spread(load(spark, sf_dir, "documents")).persist()
    toks = docs.select(
        "doc_id", "text", T.ws_tokens(F.lower(F.col("text"))).alias("ts")
    ).persist()
    uni = toks.select(F.explode("ts").alias("w"))
    base = toks.agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.count_distinct("text")).alias("n_exact_dups"),
        (F.sum(F.size("ts")).cast("double") / F.count("*")).alias("avg_tokens"),
    )
    fp = toks.filter(F.size("ts") >= 3).select(
        F.array_min(
            F.transform(
                T.word_shingles_from_tokens(F.col("ts"), 3), lambda s: F.md5(s)
            )
        ).alias("fp")
    )
    fps = fp.agg((F.count("*") - F.count_distinct("fp")).alias("n_fingerprint_collisions"))
    vocab = uni.agg(
        F.count_distinct("w").alias("vocab_size"), F.count("*").alias("total_tokens")
    )
    return (
        base.crossJoin(F.broadcast(fps))
        .crossJoin(F.broadcast(vocab))
        .select(
            "n_docs",
            "n_exact_dups",
            "n_fingerprint_collisions",
            "vocab_size",
            "total_tokens",
            "avg_tokens",
        )
    )


@query(
    "corpus_drift_psi",
    oracle="""
    WITH feat AS (
      SELECT doc_id % 2 AS snap,
             CAST(FLOOR(LOG2(n_chars + 1)) AS INT) AS bucket
      FROM documents
    ), counts AS (
      SELECT bucket,
             SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS n_b
      FROM feat GROUP BY bucket
    ), tot AS (
      SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             (CAST(n_a AS BIGINT)::DOUBLE / ta - CAST(n_b AS BIGINT)::DOUBLE / tb)
               * ln((CAST(n_a AS BIGINT)::DOUBLE * tb) / (CAST(n_b AS BIGINT)::DOUBLE * ta))
           END AS psi_contrib
    FROM counts CROSS JOIN tot
    ORDER BY bucket
    """,
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of document length between two corpus
    snapshots — the drift alarm a production data pipeline computes
    between ingests (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 broken;
    here the "snapshots" are the deterministic doc_id-parity split, the
    stand-in for last-week/this-week). Lengths land in log2 buckets
    (FIXED integer boundaries — a quantile-based binning would make the
    reference frame drift with the data it is supposed to audit); each
    bucket row carries both counts and its signed PSI contribution
    (p_a − p_b)·ln(p_a/p_b), NULL where either side is empty (the
    standard emit-don't-smooth choice: a vanished bucket is its own
    alarm, not a number). Σ psi_contrib over non-NULL rows is the PSI.

    Determinism: counts are exact ints; each contribution is one fixed
    chain of double ops on exact-int ratios (the ln argument is formed
    as (n_a·tb)/(n_b·ta) — int64 products divided once — identically in
    both engines); log2 bucket edges fall only on exact powers of two
    where IEEE log2 is exact.

    Scale shape: one map-side-combinable groupBy over the ~60-value
    log2-bucket domain; totals broadcast back as a 1-row table. No
    joins, no windows, no shuffle wider than the bucket domain."""
    docs = load(spark, sf_dir, "documents")
    feat = docs.select(
        (F.col("doc_id") % 2).alias("snap"),
        F.expr("CAST(FLOOR(LOG2(n_chars + 1)) AS INT)").alias("bucket"),
    )
    counts = feat.groupBy("bucket").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    pa = F.col("n_a").cast("double") / F.col("ta")
    pb = F.col("n_b").cast("double") / F.col("tb")
    ratio = (F.col("n_a").cast("double") * F.col("tb")) / (
        F.col("n_b").cast("double") * F.col("ta")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_a",
            "n_b",
            F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), (pa - pb) * F.log(ratio))
            .alias("psi_contrib"),
        )
        .orderBy("bucket")
    )


# --- cross-source contamination matrix -----------------------------------


@query(
    "cross_source_overlap",
    oracle=f"""
    WITH ex AS (
      SELECT DISTINCT source, md5(unnest(spans)) AS h
      FROM (SELECT source, {_SQL_SPANS} AS spans
            FROM (SELECT source, {_SQL_TOKS} AS toks FROM documents))
    ), sz AS (
      SELECT source, COUNT(*) AS n_grams FROM ex GROUP BY source
    ), shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS shared_grams
      FROM ex a JOIN ex b ON a.h = b.h AND a.source < b.source
      GROUP BY source_a, source_b
    )
    SELECT s.source_a, s.source_b,
           CAST(s.shared_grams AS BIGINT) AS shared_grams,
           CAST(za.n_grams AS BIGINT) AS n_grams_a,
           CAST(zb.n_grams AS BIGINT) AS n_grams_b,
           s.shared_grams::DOUBLE
             / (za.n_grams + zb.n_grams - s.shared_grams) AS jaccard
    FROM shared s
    JOIN sz za ON za.source = s.source_a
    JOIN sz zb ON zb.source = s.source_b
    ORDER BY s.source_a, s.source_b
    """,
)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources, how
    many distinct 8-word span fingerprints they SHARE, and the Jaccard
    of their span sets — the corpus-level read of where syndicated /
    mirrored content flows between feeds (``corpus_duplicate_spans``
    finds WHICH docs; this says WHICH PAIRS OF SOURCES leak into each
    other, the thing a crawl-source curation decision needs). Also the
    source-granular form of train/eval contamination checking: make one
    side the eval benchmark and read its row.

    Scale shape: spans are md5'd to 16-byte keys per SOURCE (distinct
    within source — source-vocabulary-sized, not token-stream-sized);
    the pair count is an equi-join ON THE HASH, so fan-out per hash is
    (sources containing it)² ≤ |sources|², never docs² — the postings
    trick of ``dedup_containment`` lifted to source granularity. Set
    sizes reduce the same table; the matrix output is |sources|² rows.

    Determinism: pure integer counts; one double divide per pair."""
    docs = spread(load(spark, sf_dir, "documents"))
    ex = (
        docs.select(
            "source", F.explode(T.word_shingles(F.col("text"), k=SPAN_K)).alias("span")
        )
        .select("source", F.md5("span").alias("h"))
        .distinct()
        .persist()
    )
    sz = ex.groupBy("source").agg(F.count("*").alias("n_grams"))
    a = ex.select(F.col("source").alias("source_a"), "h")
    b = ex.select(F.col("source").alias("source_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_grams"))
    )
    za = sz.select(F.col("source").alias("source_a"), F.col("n_grams").alias("n_grams_a"))
    zb = sz.select(F.col("source").alias("source_b"), F.col("n_grams").alias("n_grams_b"))
    return (
        shared.join(F.broadcast(za), "source_a")
        .join(F.broadcast(zb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "n_grams_a",
            "n_grams_b",
            (
                F.col("shared_grams").cast("double")
                / (F.col("n_grams_a") + F.col("n_grams_b") - F.col("shared_grams"))
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# --- per-batch novelty decay curve ---------------------------------------

NOV_BUCKET_DOCS = 50


@query(
    "doc_novelty_decay",
    oracle=f"""
    WITH ex AS MATERIALIZED (
      SELECT DISTINCT doc_id, md5(unnest(spans)) AS h
      FROM (SELECT doc_id, {_SQL_SPANS} AS spans
            FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents))
    ), first_seen AS (
      SELECT h, MIN(doc_id) AS fdoc FROM ex GROUP BY h
    ), per_doc AS (
      SELECT e.doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN f.fdoc = e.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM ex e JOIN first_seen f USING (h)
      GROUP BY e.doc_id
    )
    SELECT CAST(doc_id // {NOV_BUCKET_DOCS} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(n_grams) AS BIGINT) AS grams,
           CAST(SUM(n_novel) AS BIGINT) AS novel_grams,
           CAST(SUM(n_novel) AS BIGINT)::DOUBLE / SUM(n_grams) AS novelty
    FROM per_doc
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def doc_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty-decay curve: consuming documents in doc_id order, what
    fraction of each 50-doc batch's distinct 8-word spans has NEVER been
    seen before? The ingestion-time read of diminishing returns — a
    crawl feed whose novelty curve collapses is recrawling itself, and
    the dedup budget should move elsewhere. Doc-level n-gram twin of
    ``vocab_growth_curve`` (words) and the decision input behind
    ``corpus_temperature_mix``.

    The same first-occurrence trick as Heaps' law: a span is novel
    exactly at its min-doc_id appearance, so "seen before" needs no
    quadratic backward scan and no stateful sweep — one groupBy(h).

    Scale shape: the only vocabulary-keyed shuffle is min-doc-per-hash
    over 16-byte keys (map-side combinable); per-doc and per-bucket
    reductions are doc-keyed; output is corpus/50 rows. All counts
    integer; one double divide per bucket."""
    docs = spread(load(spark, sf_dir, "documents"))
    ex = (
        docs.select(
            "doc_id", F.explode(T.word_shingles(F.col("text"), k=SPAN_K)).alias("span")
        )
        .select("doc_id", F.md5("span").alias("h"))
        .distinct()
        .persist()
    )
    first_seen = ex.groupBy("h").agg(F.min("doc_id").alias("fdoc"))
    per_doc = (
        ex.join(first_seen, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("fdoc") == F.col("doc_id"), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
    )
    return (
        per_doc.groupBy(
            F.expr(f"doc_id div {NOV_BUCKET_DOCS}").cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_grams").alias("grams"),
            F.sum("n_novel").alias("novel_grams"),
        )
        .select(
            "bucket",
            "docs",
            "grams",
            "novel_grams",
            (F.col("novel_grams").cast("double") / F.col("grams")).alias("novelty"),
        )
        .orderBy("bucket")
    )


# --- domain mixture reweighting (DoReMi-lite) ------------------------------


@query(
    "domain_mixture_reweight",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(toks) AS w
      FROM (SELECT source, {_SQL_TOKS} AS toks FROM documents)
    ), sw AS MATERIALIZED (
      SELECT source, w, COUNT(*) AS c_sw FROM tok GROUP BY source, w
    ), ns AS (
      SELECT source, SUM(c_sw) AS n_s FROM sw GROUP BY source
    ), cw AS (
      SELECT w, SUM(c_sw) AS c_w FROM sw GROUP BY w
    ), nt AS (
      SELECT SUM(c_w) AS n FROM cw
    ), nd AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), ce AS (
      SELECT s.source,
             SUM(s.c_sw * CAST(ROUND(ln(nt.n::DOUBLE / cw.c_w) * 1e6)
                               AS BIGINT)) AS a_i6
      FROM sw s JOIN cw ON cw.w = s.w CROSS JOIN nt
      GROUP BY s.source
    ), gl AS (
      SELECT SUM(cw.c_w * CAST(ROUND(ln(nt.n::DOUBLE / cw.c_w) * 1e6)
                               AS BIGINT)) AS g_i6,
             ANY_VALUE(nt.n) AS n
      FROM cw CROSS JOIN nt
    ), scored AS (
      SELECT ce.source, ns.n_s, nd.n_docs, ce.a_i6,
             GREATEST(0, CAST(ROUND(ce.a_i6::DOUBLE / ns.n_s
                                     - g.g_i6::DOUBLE / g.n)
                              AS BIGINT)) AS excess_i6
      FROM ce JOIN ns USING (source) JOIN nd USING (source) CROSS JOIN gl g
    ), weighted AS (
      SELECT *, n_s * (1000000 + excess_i6) AS prod FROM scored
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_s AS BIGINT) AS n_tokens,
           a_i6::DOUBLE / n_s / 1e6 AS cross_entropy_nats,
           excess_i6::DOUBLE / 1e6 AS excess_nats,
           CAST(ROUND(prod::DOUBLE / (SELECT SUM(prod) FROM weighted) * 1e6)
                AS BIGINT) AS weight_ppm
    FROM weighted
    ORDER BY source
    """,
)
def domain_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture reweighting, DoReMi-lite (Xie et al. 2023,
    arXiv:2305.10429, linearized): per source, the cross-entropy of its
    token stream under the CORPUS unigram LM; sources whose
    cross-entropy exceeds the corpus mean carry positive "excess loss"
    and get upweighted — weight ∝ n_tokens · (1 + excess) — yielding the
    sampling mixture (ppm) the next training epoch draws with. The
    linear (not exponentiated) reweight keeps every step
    engine-exact; the paper's softmax form swaps in one expression.
    Complements ``corpus_temperature_mix`` (size-only smoothing) and
    ``source_token_kl`` (divergence alarm): this one emits the actual
    allocation.

    Determinism: per-TYPE nll is ``round(ln(n/c_w)·1e6)`` summed as
    int64 weighted by counts (the repo's weighted-integer-ln contract);
    excess is one fixed double op sequence rounded once; weights are
    int64 products with a single final normalization divide.

    Scale shape: one (source, word)-keyed map-side-combinable count;
    marginals reduce the TYPE table, never the token stream; everything
    after is source-cardinality-sized. The n_s·(1e6+excess) product is
    int64-safe to ~9e12 tokens per source — beyond that, compute the
    weights on the per-source token counts divided by a common 2^k
    (allocation is scale-invariant)."""
    docs = spread(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(T.ws_tokens(F.lower(F.col("text")))).alias("w")
    )
    sw = tok.groupBy("source", "w").agg(F.count("*").alias("c_sw"))
    ns = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    nt = cw.agg(F.sum("c_w").alias("n"))
    nd = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    nll_i6 = F.round(
        F.log(F.col("n").cast("double") / F.col("c_w")) * F.lit(1e6)
    ).cast("bigint")
    ce = (
        sw.join(cw, "w")
        .crossJoin(F.broadcast(nt))
        .groupBy("source")
        .agg(F.sum(F.col("c_sw") * nll_i6).alias("a_i6"))
    )
    glob = (
        cw.crossJoin(F.broadcast(nt))
        .agg(
            F.sum(F.col("c_w") * nll_i6).alias("g_i6"),
            F.any_value(F.col("n")).alias("n"),
        )
    )
    excess_i6 = F.greatest(
        F.lit(0).cast("bigint"),
        F.round(
            F.col("a_i6").cast("double") / F.col("n_s")
            - F.col("g_i6").cast("double") / F.col("n")
        ).cast("bigint"),
    )
    weighted = (
        ce.join(F.broadcast(ns), "source")
        .join(F.broadcast(nd), "source")
        .crossJoin(F.broadcast(glob))
        .select(
            "source",
            "n_docs",
            "n_s",
            "a_i6",
            excess_i6.alias("excess_i6"),
        )
        .withColumn("prod", F.col("n_s") * (F.lit(1_000_000) + F.col("excess_i6")))
    )
    tot = weighted.agg(F.sum("prod").alias("tot"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_s").cast("bigint").alias("n_tokens"),
            (F.col("a_i6").cast("double") / F.col("n_s") / F.lit(1e6)).alias(
                "cross_entropy_nats"
            ),
            (F.col("excess_i6").cast("double") / F.lit(1e6)).alias("excess_nats"),
            F.round(F.col("prod").cast("double") / F.col("tot") * F.lit(1e6))
            .cast("bigint")
            .alias("weight_ppm"),
        )
        .orderBy("source")
    )


# --- BPE merge loop (tokenizer training, 3 steps) --------------------------

BPE_MERGES = 3


def _sql_bpe_stage(t: int) -> str:
    # The merge application is a left-to-right greedy fold in SYMBOL
    # space (Sennrich et al. 2016 semantics): a literal replace of
    # ' A B ' with ' AB ' would skip every second occurrence of an
    # adjacent run ('abab' -> ' ab a b ', not ' ab ab ' — consecutive
    # matches share the delimiter space). list_reduce seeds the
    # accumulator with the first symbol; each next symbol either fuses
    # with the accumulator's last token (exactly when that token is A
    # and the symbol is B — a just-merged token 'AB' can never equal A,
    # so non-overlap is automatic) or appends. Symbols never contain
    # spaces, so the suffix test ' ' || A is token-exact.
    return f"""p{t} AS MATERIALIZED (
      SELECT pair, SUM(cnt) AS n FROM (
        SELECT unnest([syms[i] || ' ' || syms[i + 1]
                       for i in range(1, len(syms))]) AS pair, cnt
        FROM (SELECT list_filter(regexp_split_to_array(trim(s), ' '),
                                 x -> x <> '') AS syms, cnt
              FROM v{t - 1})
      ) GROUP BY pair
    ), b{t} AS MATERIALIZED (
      SELECT pair, n, split_part(pair, ' ', 1) AS pa,
             split_part(pair, ' ', 2) AS pb,
             replace(pair, ' ', '') AS pm
      FROM p{t} ORDER BY n DESC, pair LIMIT 1
    ), v{t} AS MATERIALIZED (
      SELECT ' ' || list_reduce(
               list_filter(regexp_split_to_array(trim(v.s), ' '), x -> x <> ''),
               (acc, x) -> CASE
                 WHEN x = b.pb AND (acc = b.pa OR ends_with(acc, ' ' || b.pa))
                 THEN substr(acc, 1, length(acc) - length(b.pa)) || b.pm
                 ELSE acc || ' ' || x END
             ) || ' ' AS s,
             v.cnt
      FROM v{t - 1} v, b{t} b
    )"""


def bpe_apply_merge(s: "F.Column", pair: str, merged: str) -> "F.Column":
    """Apply ONE BPE merge rule to a padded ``' a b c '`` symbol string:
    left-to-right greedy fold over the symbol array (Sennrich et al.
    2016), merging every non-overlapping adjacent (A, B) occurrence —
    NOT a literal ``replace(' A B ', ' AB ')``, which skips every
    second occurrence of an adjacent run because consecutive matches
    share the delimiter space ('abab' would yield ' ab a b ').

    The fold appends each symbol to a space-joined accumulator unless
    the accumulator's last token is A and the symbol is B, in which
    case the tail token is rewritten to AB. Non-overlap is automatic:
    a just-merged tail 'AB' can never equal A (symbols are non-empty,
    so A·B ≠ A). Symbols never contain spaces, so the ``' ' || A``
    suffix test is token-exact. Mirrors the oracle's ``list_reduce``
    lambda bit-for-bit; property-tested against a scalar greedy
    reference in tests/test_bpe_property.py."""
    a, b = pair.split(" ")
    la, lb, lm = F.lit(a), F.lit(b), F.lit(merged)

    def step(acc: "F.Column", x: "F.Column") -> "F.Column":
        last_is_a = (acc == la) | F.endswith(acc, F.concat(F.lit(" "), la))
        fused = F.concat(acc.substr(F.lit(1), F.length(acc) - F.length(la)), lm)
        appended = F.when(acc == F.lit(""), x).otherwise(
            F.concat(acc, F.lit(" "), x)
        )
        return F.when(last_is_a & (x == lb), fused).otherwise(appended)

    folded = F.aggregate(F.split(F.trim(s), " "), F.lit(""), step)
    return F.concat(F.lit(" "), folded, F.lit(" "))


def _sql_bpe_stage_w(t: int) -> str:
    # Carry-w variant of ``_sql_bpe_stage`` for ENCODING oracles: the
    # identical pair count / argmax pick / list_reduce fold, but (a) the
    # original word rides along so the final state doubles as the
    # word-type encode table, and (b) an empty merge pick (b{t} has no
    # rows — a degenerate corpus can run out of adjacent pairs before
    # BPE_MERGES rounds) leaves the vocabulary UNTOUCHED instead of
    # emptying it via the cross join, mirroring the Spark loop's
    # break-on-no-pairs.
    return f"""p{t} AS MATERIALIZED (
      SELECT pair, SUM(cnt) AS n FROM (
        SELECT unnest([syms[i] || ' ' || syms[i + 1]
                       for i in range(1, len(syms))]) AS pair, cnt
        FROM (SELECT list_filter(regexp_split_to_array(trim(s), ' '),
                                 x -> x <> '') AS syms, cnt
              FROM v{t - 1})
      ) GROUP BY pair
    ), b{t} AS MATERIALIZED (
      SELECT pair, n, split_part(pair, ' ', 1) AS pa,
             split_part(pair, ' ', 2) AS pb,
             replace(pair, ' ', '') AS pm
      FROM p{t} ORDER BY n DESC, pair LIMIT 1
    ), v{t} AS MATERIALIZED (
      SELECT v.w,
             CASE WHEN b.pm IS NULL THEN v.s
             ELSE ' ' || list_reduce(
               list_filter(regexp_split_to_array(trim(v.s), ' '), x -> x <> ''),
               (acc, x) -> CASE
                 WHEN x = b.pb AND (acc = b.pa OR ends_with(acc, ' ' || b.pa))
                 THEN substr(acc, 1, length(acc) - length(b.pa)) || b.pm
                 ELSE acc || ' ' || x END
             ) || ' ' END AS s,
             v.cnt
      FROM v{t - 1} v LEFT JOIN b{t} b ON TRUE
    )"""


_BPE_STAGES = ",\n    ".join(_sql_bpe_stage(t) for t in range(1, BPE_MERGES + 1))
_BPE_STAGES_W = ",\n    ".join(_sql_bpe_stage_w(t) for t in range(1, BPE_MERGES + 1))

# Shared CTE chain for encoding oracles: train the merge table on the
# word-type vocabulary (carrying w), then read off each type's BPE
# token count. Importers (tokenizer fertility) compose it with their
# own aggregation.
BPE_ENCODE_CTES = f"""words AS (
      SELECT unnest({_SQL_TOKS}) AS w FROM documents
    ), vocab AS (
      SELECT w, COUNT(*) AS cnt FROM words WHERE length(w) >= 1 GROUP BY w
    ), v0 AS MATERIALIZED (
      SELECT w,
             ' ' || array_to_string([substr(w, i, 1)
                                     for i in range(1, length(w) + 1)], ' ')
                 || ' ' AS s,
             cnt
      FROM vocab
    ),
    {_BPE_STAGES_W},
    enc AS (
      SELECT w, CAST(len(list_filter(regexp_split_to_array(trim(s), ' '),
                                     x -> x <> '')) AS BIGINT) AS n_sub
      FROM v{BPE_MERGES}
    )"""


def encoded_word_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE artifact: ``(w, n_sub)`` — each word type's
    BPE token count under the merge table trained on this corpus
    (``_bpe_train``; merges applied exhaustively in rank order, exactly
    the segmentation training itself produced). Vocabulary-sized and
    persisted via the training loop's final state."""
    _log, v = _bpe_train(spark, sf_dir)
    return v.select(
        "w",
        F.size(F.split(F.trim(F.col("s")), " ")).cast("bigint").alias("n_sub"),
    )
_BPE_FINAL = "\n      UNION ALL\n      ".join(
    f"SELECT {t} AS step, pair, CAST(n AS BIGINT) AS n, "
    f"replace(pair, ' ', '') AS merged FROM b{t}"
    for t in range(1, BPE_MERGES + 1)
)


@query(
    "bpe_merge_sequence",
    oracle=f"""
    WITH words AS (
      SELECT unnest({_SQL_TOKS}) AS w FROM documents
    ), vocab AS (
      SELECT w, COUNT(*) AS cnt FROM words WHERE length(w) >= 1 GROUP BY w
    ), v0 AS MATERIALIZED (
      SELECT ' ' || array_to_string([substr(w, i, 1)
                                     for i in range(1, length(w) + 1)], ' ')
                 || ' ' AS s,
             cnt
      FROM vocab
    ),
    {_BPE_STAGES}
    SELECT step, pair, n, merged FROM (
      {_BPE_FINAL}
    ) ORDER BY step
    """,
)
def bpe_merge_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the actual LOOP ({BPE_MERGES} merges):
    count corpus-weighted adjacent symbol pairs over the word-type
    vocabulary, merge the argmax pair ((n DESC, pair ASC) total order),
    re-segment, repeat — ``bpe_pair_merge_step`` is one scan of this
    loop; this runs the fixed point the Sennrich et al. 2016 trainer
    runs, emitting the merge table (step, pair, frequency, new symbol)
    that IS a BPE tokenizer's artifact.

    Determinism: pair counts are word-frequency-weighted integers over
    the TYPE vocabulary; the merge pick is a total order; the merge
    application is a left-to-right greedy symbol-space fold
    (``bpe_apply_merge`` / the oracle's ``list_reduce`` lambda —
    identical CASE logic in both engines), which merges EVERY
    non-overlapping adjacent occurrence per round the way the Sennrich
    trainer does ('abab' -> ' ab ab ', not the first-occurrence-only
    result a literal replace would give).

    Scale shape: the loop state is the word-TYPE vocabulary (s, cnt) —
    vocabulary-sized, never the token stream, exactly how real BPE
    trainers batch (count words once, train on types); each iteration
    is one map-side-combinable pair count + one per-row fold with the
    merge rule baked in as literals. The top-pair pick collects ONE row
    per round (the kmeans/PCA broadcast-state shape), and the
    superseded vocabulary cache is released each round, so the cache
    footprint is ≤ 2 vocabularies at any instant regardless of
    BPE_MERGES. The oracle unrolls the same {BPE_MERGES} rounds."""
    # NOTE: do NOT unpersist v here — _bpe_train is session-memoized
    # and a later BPE-family query in the same session reuses it; the
    # memo (eviction) and the harness cache contract own its lifecycle.
    log, _v = _bpe_train(spark, sf_dir)
    if not log:
        return spark.createDataFrame([], "step int, pair string, n bigint, merged string")
    return spark.createDataFrame(
        log, "step int, pair string, n bigint, merged string"
    ).orderBy("step")


@query(
    "bpe_encode_corpus",
    oracle=f"""
    WITH {BPE_ENCODE_CTES},
    tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ), perdoc AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(e.n_sub) AS BIGINT) AS n_bpe_tokens,
             CAST(SUM(length(t.w)) AS BIGINT) AS n_word_chars
      FROM tok t JOIN enc e USING (w) GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_words, 0) AS n_words,
           COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens,
           COALESCE(p.n_word_chars, 0) AS n_word_chars,
           CASE WHEN p.n_bpe_tokens > 0
                THEN ROUND(CAST(p.n_word_chars AS DOUBLE) / p.n_bpe_tokens, 6)
           END AS chars_per_bpe_token
    FROM documents d LEFT JOIN perdoc p USING (doc_id)
    ORDER BY doc_id
    """,
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer INFERENCE — the tokenize-and-count every real
    pipeline runs at full scale nightly, and the missing half of
    ``bpe_merge_sequence`` (train merges ↔ apply merges): train the
    {BPE_MERGES}-rule merge table on this corpus, encode every document
    with it, and report per-doc word count, BPE token count, word
    chars, and chars-per-BPE-token (the per-doc fertility the corpus
    budget is priced in).

    Encode convention: merges apply exhaustively in RANK ORDER via the
    same greedy left-to-right fold training used (``bpe_apply_merge``)
    — so each word type's segmentation is exactly the one the trainer
    left it with, the Sennrich word-type convention. A word with no
    mergeable pairs stays character-split; if the corpus runs out of
    adjacent pairs before {BPE_MERGES} rounds, the remaining rounds are
    no-ops in BOTH engines (the Spark loop breaks; the oracle's
    LEFT-JOIN stages pass the vocabulary through).

    Determinism: the merge table is the (n DESC, pair ASC) total-order
    argmax sequence; token counts are exact integers; the only double
    is one guarded ROUND(chars/tokens, 6) per doc.

    Scale shape: training state is the word-TYPE vocabulary (never the
    token stream, ≤2 cached vocabularies at any instant); the encode
    table is vocabulary-sized and joins the exploded corpus on the word
    (equi-key shuffle, AQE broadcasts it when small); per-doc sums are
    map-side combinable. No per-document Python, no all-pairs work."""
    enc = encoded_word_types(spark, sf_dir)
    docs = spread(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(T.ws_tokens(F.lower(F.col("text")))).alias("w")
    )
    perdoc = (
        tok.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_bpe_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_word_chars"),
        )
    )
    zero = F.lit(0).cast("bigint")
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", zero).alias("n_words"),
            F.coalesce("n_bpe_tokens", zero).alias("n_bpe_tokens"),
            F.coalesce("n_word_chars", zero).alias("n_word_chars"),
            F.when(
                F.col("n_bpe_tokens") > 0,
                F.round(
                    F.col("n_word_chars").cast("double") / F.col("n_bpe_tokens"), 6
                ),
            ).alias("chars_per_bpe_token"),
        )
        .orderBy("doc_id")
    )


# Memo for _bpe_train, keyed by (applicationId, sf_dir) so a session
# running several BPE-family queries (bpe_merge_sequence,
# bpe_encode_corpus, tokenizer_fertility_by_lang,
# mannwhitney_fertility_drift, corpus_release_gate's fertility leg)
# trains the tokenizer ONCE — the exact _RANKINGS_MEMO pattern
# (similarity.py) the round-10 VERDICT asked to replicate here (ask
# #2). Bounded: oldest entry evicted (and its vocabulary unpersisted)
# past 8 keys. Same documented caveat as the rankings memo: keys are
# PATH identity — the test corpus is immutable; a mutable deployment
# should key on a table snapshot id.
_BPE_MEMO: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _bpe_train(
    spark: SparkSession, sf_dir: str
) -> "tuple[list[tuple[int, str, int, str]], DataFrame]":
    """Session-memoized BPE training: returns the cached
    ``(merge_log, encoded_vocab)`` for this (applicationId, sf_dir) if
    the session has already trained, re-persisting the vocabulary if a
    ``spark.catalog.clearCache()`` since the last call silently
    unpersisted it (the frame stays valid — it lineage-replays the
    50-merge fold chain in one job, with no re-run of the training
    loop's per-round argmax collects, which are the expensive part).
    Callers must treat the returned log as immutable and must NOT
    unpersist the vocabulary — the memo owns its lifecycle (eviction
    unpersists)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BPE_MEMO.get(key)
    if hit is not None:
        v_ = hit[1]
        lvl = v_.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            v_.persist()
        return hit
    log, v = _bpe_train_uncached(spark, sf_dir)
    while len(_BPE_MEMO) >= 8:
        _BPE_MEMO.pop(next(iter(_BPE_MEMO)))[1].unpersist(blocking=False)
    _BPE_MEMO[key] = (log, v)
    return log, v


def _bpe_train_uncached(
    spark: SparkSession, sf_dir: str
) -> "tuple[list[tuple[int, str, int, str]], DataFrame]":
    """Run the BPE merge-training loop on the documents word-type
    vocabulary and return ``(merge_log, encoded_vocab)``: the merge
    table (step, pair, n, merged) AND the final re-segmented vocabulary
    ``(w, s, cnt)`` — the padded symbol string after every applied
    merge, i.e. the trained tokenizer's ENCODING of each word type.
    ``encoded_vocab`` is left persisted (vocabulary-sized; the cache
    contract releases it between queries). Use the memoized
    ``_bpe_train`` wrapper — this body is one training run."""
    docs = spread(load(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(T.ws_tokens(F.lower(F.col("text")))).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    # split(w, '') yields one element per char in Spark 4 (no trailing
    # empty); the padded ' a b ' form makes every pair replacement a
    # boundary-safe literal substring. ``w`` rides along untouched so
    # the final state doubles as the word-type encode table.
    v = vocab.select(
        "w",
        F.concat(
            F.lit(" "),
            F.array_join(F.split(F.col("w"), ""), " "),
            F.lit(" "),
        ).alias("s"),
        "cnt",
    ).persist()
    log = []
    prev = None
    for step in range(1, BPE_MERGES + 1):
        # single-symbol guard: sequence(1, 0) counts DOWN (the repo-wide
        # trap) and would then element_at past the end under ANSI
        pairs = v.select(
            F.explode(
                F.expr(
                    "transform("
                    "  if(size(split(trim(s), ' ')) >= 2,"
                    "     sequence(1, size(split(trim(s), ' ')) - 1),"
                    "     cast(array() as array<int>)), "
                    "i -> concat(element_at(split(trim(s), ' '), i), ' ', "
                    "element_at(split(trim(s), ' '), i + 1)))"
                )
            ).alias("pair"),
            "cnt",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()
        )
        # the collect above materialized v's cache (reading prev's), so
        # the round-before-last vocabulary is now superseded — release
        # it here rather than accumulating BPE_MERGES caches (and clear
        # the handle so the post-loop cleanup can't double-release it)
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top:
            break
        pair, n = top[0].pair, int(top[0].n)
        merged = pair.replace(" ", "")
        log.append((step, pair, n, merged))
        prev = v
        v = v.select(
            "w", bpe_apply_merge(F.col("s"), pair, merged).alias("s"), "cnt"
        ).persist()
    if prev is not None:
        prev.unpersist()
    return log, v


# --- unseen-mass estimation (round 7) ---------------------------------------


@query(
    "chao1_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_SQL_TOKS}) AS w FROM documents
    ), tf AS (
      SELECT w, COUNT(*) AS c FROM tok GROUP BY w
    ), spec AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM tf
    )
    SELECT d AS observed_types, n AS n_tokens, f1 AS singletons,
           f2 AS doubletons,
           CASE WHEN f2 > 0 THEN
             ROUND(d + CAST(f1 AS DOUBLE) * f1 / (2 * f2), 3)
           ELSE ROUND(d + CAST(f1 AS DOUBLE) * (f1 - 1) / 2, 3)
           END AS chao1_estimate,
           CASE WHEN n > 0 THEN
             ROUND(CAST(f1 AS DOUBLE) / n, 9) END AS gt_unseen_mass,
           CASE WHEN n > 0 THEN
             ROUND(1 - CAST(f1 AS DOUBLE) / n, 9) END AS gt_coverage
    FROM spec
    """,
)
def chao1_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much vocabulary have we NOT seen yet? Chao1's lower bound on
    total type richness (observed + f1²/2f2 from the
    frequency-of-frequencies; bias-corrected form when no doubletons)
    and Turing's estimate of the unseen probability mass (f1/N — the
    Good-Turing leave-one-out argument). The corpus-planning readout:
    a high unseen mass says more crawling will keep buying new
    vocabulary; coverage near 1 says the source is mined out. Composes
    the same spectrum `vocab_frequency_spectrum` reports raw.

    Determinism: f1/f2/D/N are exact integer reductions of the
    token-TYPE table; both estimators are single pinned double chains
    under identical CASE guards (Chao1 switches to the bias-corrected
    form when f2 = 0).

    Scale shape: one map-side-combinable type count, one scalar
    reduction — the spectrum never materializes per-token state."""
    docs = spread(load(spark, sf_dir, "documents"))
    tf = (
        docs.select(F.explode(T.ws_tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    spec = tf.agg(
        F.count("*").alias("d"),
        F.sum("c").alias("n"),
        F.sum((F.col("c") == 1).cast("bigint")).alias("f1"),
        F.sum((F.col("c") == 2).cast("bigint")).alias("f2"),
    )
    f1d = F.col("f1").cast("double")
    chao = F.when(
        F.col("f2") > 0,
        F.round(F.col("d") + f1d * F.col("f1") / (2 * F.col("f2")), 3),
    ).otherwise(F.round(F.col("d") + f1d * (F.col("f1") - 1) / 2, 3))
    okn = F.col("n") > 0
    return spec.select(
        F.col("d").alias("observed_types"),
        F.col("n").alias("n_tokens"),
        F.col("f1").alias("singletons"),
        F.col("f2").alias("doubletons"),
        chao.alias("chao1_estimate"),
        F.when(okn, F.round(f1d / F.col("n"), 9)).alias("gt_unseen_mass"),
        F.when(okn, F.round(1 - f1d / F.col("n"), 9)).alias("gt_coverage"),
    )
