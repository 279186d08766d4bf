"""Table-maintenance operators for a lakehouse-style pipeline: MERGE-style
upsert (SCD1 latest-wins), order-independent table checksums for
migration/backfill validation, exact-k deterministic stratified sampling,
and gaps-and-islands streak detection.

These are the operations a team running a 100 TB corpus refresh needs
around the analytics proper: apply a CDC delta to a snapshot, prove two
derivations of a table are identical without sorting either, pull a
reproducible audit sample per stratum, and profile activity continuity.

Determinism notes: every aggregate is integer (counts, cents, md5-derived
int64s); latest-wins picks are total-ordered by (event time, unique key);
sample ranks order by md5 hex with a unique-key tiebreak — identical
string collation in both engines ([0-9a-f] is ASCII).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions.hashing import md5_int, sql_md5_int
from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.functions.ranks import rank_after_limit
from bigdata_2025_1_spark.registry import query

# SCD1 cutover: orders before the cutoff form the standing snapshot, the
# rest replay as the incoming delta (a stand-in for a CDC feed).
MERGE_CUTOFF = "1998-01-01"


@query(
    "merge_upsert_latest_state",
    oracle=f"""
    WITH ranked AS (
      SELECT o_custkey AS custkey,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 1e2) AS BIGINT) AS total_cents,
             CAST(o_orderdate AS DATE) AS last_date,
             (o_orderdate < TIMESTAMP '{MERGE_CUTOFF} 00:00:00') AS is_base,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey,
                            (o_orderdate < TIMESTAMP '{MERGE_CUTOFF} 00:00:00')
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ), snap AS (SELECT * FROM ranked WHERE rn = 1 AND is_base),
       delta AS (SELECT * FROM ranked WHERE rn = 1 AND NOT is_base)
    SELECT COALESCE(d.custkey, b.custkey) AS custkey,
           COALESCE(d.status, b.status) AS status,
           COALESCE(d.total_cents, b.total_cents) AS total_cents,
           COALESCE(d.last_date, b.last_date) AS last_date,
           CASE WHEN b.custkey IS NULL THEN 'insert'
                WHEN d.custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM snap b FULL OUTER JOIN delta d ON d.custkey = b.custkey
    ORDER BY custkey
    """,
)
def merge_upsert_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style SCD1 upsert: a per-customer snapshot (latest order state
    before the cutoff) receives a delta (orders after the cutoff) with
    latest-wins semantics — `update` where the delta hits an existing key,
    `insert` where the key is new, `keep` where the delta is silent. This
    is `MERGE INTO t USING delta WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT` re-expressed on plain files.

    Physical shape: ONE hash aggregation on custkey — both sides' latest
    rows come from `max(when(era, struct(ts, key, payload)))`, which
    combines map-side (struct max is associative), so the full-history
    scan collapses before the single shuffle. The oracle's equivalent
    window+full-outer-join formulation costs two shuffles; at 100 TB the
    agg form halves the exchanged bytes and cannot skew worse than the
    key distribution itself. Latest-wins is total-ordered by
    (o_orderdate, o_orderkey) — unique, so both formulations agree."""
    orders = load(spark, sf_dir, "orders")
    is_base = F.col("o_orderdate") < F.lit(MERGE_CUTOFF).cast("timestamp")
    state = F.struct(
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    g = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.when(is_base, state)).alias("b"),
        F.max(F.when(~is_base, state)).alias("d"),
    )
    pick = lambda f: F.coalesce(F.col(f"d.{f}"), F.col(f"b.{f}"))  # noqa: E731
    return g.select(
        "custkey",
        pick("status").alias("status"),
        pick("total_cents").alias("total_cents"),
        F.to_date(pick("ts")).alias("last_date"),
        F.when(F.col("b").isNull(), F.lit("insert"))
        .when(F.col("d").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
    ).orderBy("custkey")


N_CHECKSUM_BUCKETS = 16
# row fingerprint: 12 hex chars of md5 (48 bits) → int64; summed mod-1e9
# residues keep any realistic row count far inside int64.
# Every fingerprint input goes through COALESCE(..., '') in BOTH engines:
# without it Spark's concat_ws would skip a NULL column while DuckDB's ||
# would null the whole fingerprint and silently drop the row from SUM —
# the checksums would diverge on the first NULL to ever appear.
_ROW_FP = (
    sql_md5_int(
        "COALESCE(CAST(o_orderkey AS VARCHAR), '') || '|' || "
        "COALESCE(CAST(o_custkey AS VARCHAR), '') || '|' || "
        "COALESCE(o_orderstatus, '') || '|' || "
        "COALESCE(CAST(CAST(ROUND(o_totalprice * 1e2) AS BIGINT) AS VARCHAR), '')"
    )
    + " % 1000000000"
)


@query(
    "table_checksum_buckets",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey % {N_CHECKSUM_BUCKETS} AS bucket,
             COUNT(*) AS n_rows, SUM({_ROW_FP}) AS checksum
      FROM orders GROUP BY bucket
    ), b AS (
      SELECT o_orderkey % {N_CHECKSUM_BUCKETS} AS bucket,
             COUNT(*) AS n_rows_b, SUM({_ROW_FP}) AS checksum_b
      FROM (SELECT * FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT * FROM orders WHERE o_orderstatus <> 'O') orders
      GROUP BY bucket
    )
    SELECT a.bucket, CAST(a.n_rows AS BIGINT) AS n_rows,
           CAST(a.checksum AS BIGINT) AS checksum,
           CAST(b.n_rows_b AS BIGINT) AS n_rows_b,
           CAST(b.checksum_b AS BIGINT) AS checksum_b,
           (a.n_rows = b.n_rows_b AND a.checksum = b.checksum_b) AS consistent
    FROM a JOIN b USING (bucket)
    ORDER BY bucket
    """,
)
def table_checksum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent bucketed table checksums — the standard way to
    prove a 100 TB migration/backfill reproduced a table without sorting
    or co-locating either copy: per key-bucket, count rows and sum a
    per-row md5-derived int64 residue. Sums are associative/commutative,
    so partitioning, file order, and engine cannot change them; a
    mismatch localizes the damage to 1/16th of the keyspace.

    Here the "two copies" are two plan derivations of the same table (a
    direct scan vs a disjoint filter-union — the shape a staged rewrite
    produces), checked bucket-by-bucket to all-`consistent` = true.

    Scale shape: two scans, each collapsing map-side to ≤16 partial rows
    per task before a 16-row exchange; the final join is trivially
    broadcast. No sort, no wide shuffle, bytes exchanged independent of
    table size."""
    orders = load(spark, sf_dir, "orders")

    def fingerprint() -> F.Column:
        # explicit separators + per-column coalesce-to-'' (concat_ws
        # would SKIP a NULL column, shifting the layout) — mirrors
        # _ROW_FP's NULL semantics exactly
        def _c(col: F.Column) -> F.Column:
            return F.coalesce(col.cast("string"), F.lit(""))

        row = F.concat(
            _c(F.col("o_orderkey")),
            F.lit("|"),
            _c(F.col("o_custkey")),
            F.lit("|"),
            _c(F.col("o_orderstatus")),
            F.lit("|"),
            _c(F.round(F.col("o_totalprice") * 100).cast("bigint")),
        )
        return md5_int(row) % 1000000000

    def bucketed(df: DataFrame, n_name: str, c_name: str) -> DataFrame:
        return df.groupBy((F.col("o_orderkey") % N_CHECKSUM_BUCKETS).alias("bucket")).agg(
            F.count("*").alias(n_name), F.sum(fingerprint()).alias(c_name)
        )

    a = bucketed(orders, "n_rows", "checksum")
    rewritten = orders.filter(F.col("o_orderstatus") == "O").unionAll(
        orders.filter(F.col("o_orderstatus") != "O")
    )
    b = bucketed(rewritten, "n_rows_b", "checksum_b")
    return (
        a.join(b, "bucket")
        .select(
            "bucket",
            "n_rows",
            "checksum",
            "n_rows_b",
            "checksum_b",
            (
                (F.col("n_rows") == F.col("n_rows_b"))
                & (F.col("checksum") == F.col("checksum_b"))
            ).alias("consistent"),
        )
        .orderBy("bucket")
    )


SAMPLE_PER_STRATUM = 20


@query(
    "stratified_exact_sample",
    oracle=f"""
    SELECT o_orderpriority AS priority, CAST(sample_rank AS INT) AS sample_rank,
           o_orderkey AS orderkey,
           CAST(ROUND(o_totalprice * 1e2) AS BIGINT) AS total_cents
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY md5(CAST(o_orderkey AS VARCHAR)),
                                         o_orderkey) AS sample_rank
      FROM orders
    )
    WHERE sample_rank <= {SAMPLE_PER_STRATUM}
    ORDER BY priority, sample_rank
    """,
)
def stratified_exact_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k deterministic stratified sample: per order priority, the
    20 rows whose md5(key) hex sorts lowest — a reproducible uniform
    sample (md5 is a fixed random permutation of the keyspace) that any
    engine, any partitioning, any day re-derives identically; the audit
    -sample contract `TABLESAMPLE` cannot give (it is neither exact-k
    nor stable).

    Scale shape: rank-by-hash per stratum is a top-k, not a sort — at
    scale Spark evaluates the window with a partial top-k per map task
    (a `WindowGroupLimit` pushdown, rn ≤ k filters map-side) so only
    ~k rows per task per stratum reach the shuffle."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        orders.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= SAMPLE_PER_STRATUM)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("sample_rank").cast("int").alias("sample_rank"),
            F.col("o_orderkey").alias("orderkey"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
        )
        .orderBy("priority", "sample_rank")
    )


@query(
    "order_month_streaks",
    oracle="""
    WITH months AS (
      SELECT DISTINCT o_custkey AS custkey,
             EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) AS m
      FROM orders
    ), islands AS (
      SELECT custkey, m,
             m - ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY m) AS island
      FROM months
    ), streaks AS (
      SELECT custkey, island, COUNT(*) AS streak_len
      FROM islands GROUP BY custkey, island
    )
    SELECT custkey,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(SUM(streak_len) AS BIGINT) AS active_months,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY custkey
    ORDER BY custkey
    """,
)
def order_month_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per customer, the longest run of consecutive
    calendar months with ≥1 order. The classic `value − row_number()`
    trick turns consecutive runs into constant island keys — no
    self-join, no iteration.

    Scale shape: distinct → window → two aggs, ALL partitioned by
    custkey: Catalyst reuses one custkey exchange across the distinct,
    the window sort, and both groupBys (month indices are tiny ints, so
    per-customer state is bounded by the calendar, not the data)."""
    orders = load(spark, sf_dir, "orders")
    months = orders.select(
        F.col("o_custkey").alias("custkey"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
    ).distinct()
    w = Window.partitionBy("custkey").orderBy("m")
    islands = months.withColumn("island", F.col("m") - F.row_number().over(w))
    streaks = islands.groupBy("custkey", "island").agg(F.count("*").alias("streak_len"))
    return (
        streaks.groupBy("custkey")
        .agg(
            F.max("streak_len").alias("longest_streak"),
            F.sum("streak_len").alias("active_months"),
            F.count("*").alias("n_streaks"),
        )
        .orderBy("custkey")
    )


@query(
    "incremental_monthly_rollup",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate)
               AS month,
             COUNT(*) AS n,
             SUM(CAST(ROUND(o_totalprice * 1e2) AS BIGINT)) AS cents
      FROM orders GROUP BY day, month
    ), merged AS (
      SELECT month, SUM(n) AS n_orders, SUM(cents) AS revenue_cents,
             COUNT(*) AS n_partials
      FROM daily GROUP BY month
    ), direct AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate)
               AS month,
             COUNT(*) AS n_orders_d,
             SUM(CAST(ROUND(o_totalprice * 1e2) AS BIGINT)) AS revenue_cents_d
      FROM orders GROUP BY month
    )
    SELECT CAST(m.month AS BIGINT) AS month,
           CAST(m.n_partials AS BIGINT) AS n_partials,
           CAST(m.n_orders AS BIGINT) AS n_orders,
           CAST(m.revenue_cents AS BIGINT) AS revenue_cents,
           (m.n_orders = d.n_orders_d AND m.revenue_cents = d.revenue_cents_d)
             AS matches_direct
    FROM merged m JOIN direct d USING (month)
    ORDER BY month
    """,
)
def incremental_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, demonstrated and VERIFIED in one
    query: daily partial aggregates (what a nightly job persists) merge
    into monthly totals, and every month is checked against the direct
    full-scan aggregation — `matches_direct` must be uniformly true
    because the partials are integers under associative SUM/COUNT. This
    is the algebra that lets a 100 TB rollup reprocess ONE day instead
    of rescanning history (and the same mergeability contract behind the
    sketch family: HLL unions, CMS cells, quantile-sketch merge).

    Determinism: all integers; the verdict is an integer comparison.

    Scale shape: both branches are map-side-combinable aggregates; the
    daily partial table is calendar-sized, so the merge and the
    verification join cost nothing at any data volume."""
    orders = load(spark, sf_dir, "orders")
    month = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("month")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day"), month
    ).agg(F.count("*").alias("n"), F.sum(cents).alias("cents"))
    merged = daily.groupBy("month").agg(
        F.sum("n").alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
        F.count("*").alias("n_partials"),
    )
    direct = orders.groupBy(month).agg(
        F.count("*").alias("n_orders_d"), F.sum(cents).alias("revenue_cents_d")
    )
    return (
        merged.join(direct, "month")
        .select(
            F.col("month").cast("bigint").alias("month"),
            "n_partials",
            "n_orders",
            "revenue_cents",
            (
                (F.col("n_orders") == F.col("n_orders_d"))
                & (F.col("revenue_cents") == F.col("revenue_cents_d"))
            ).alias("matches_direct"),
        )
        .orderBy("month")
    )


# --- weighted sampling without replacement (exponential race) ------------

WSAMPLE_K = 25
# deterministic uniform in (0, 1]: md5(doc_id) -> 12 hex digits -> int ->
# residue in [0, 1e9) -> (r + 1) / (1e9 + 1). Identical arithmetic in
# both engines; no engine RNG anywhere.
_SQL_U = (
    f"(({sql_md5_int('CAST(doc_id AS VARCHAR)')} % 1000000000)"
    " + 1)::DOUBLE / 1000000001"
)


@query(
    "weighted_sample_wor",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             CAST(ROUND(-ln({_SQL_U}) / n_chars * 1e12) AS BIGINT) AS key_i12
      FROM documents
      WHERE n_chars > 0
    ), ranked AS (
      SELECT doc_id, n_chars, key_i12,
             ROW_NUMBER() OVER (ORDER BY key_i12, doc_id) AS sample_rank
      FROM keyed
    )
    SELECT CAST(sample_rank AS INT) AS sample_rank, doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           key_i12::DOUBLE / 1e12 AS race_key
    FROM ranked WHERE sample_rank <= {WSAMPLE_K}
    ORDER BY sample_rank
    """,
)
def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006 in
    its exponential-race form): each row draws key = -ln(u)/w with u
    uniform in (0,1] and w = its weight (n_chars); the k smallest keys
    ARE a weighted sample without replacement. The standard way to take
    a size-k weighted sample from a distributed table in ONE pass — no
    sequential draws, no rejection loop, no total-weight pre-pass.

    Determinism: u derives from md5(doc_id) (both engines, identical
    integer arithmetic), the single per-row ln is rounded once to int64
    1e-12ths (same libm-rounding contract as the ln/log family), and the
    race ranks on (key_i12, doc_id) — bit-stable everywhere.

    Scale shape: a map-only key computation followed by TakeOrdered(k)
    — per-partition top-k then a k-row merge on the driver; no shuffle
    of the table, no global sort. Rerunning with a different md5 salt
    gives an independent replicate (bootstrap loops reuse the plan)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        (md5_int(F.col("doc_id").cast("string")) % 1000000000 + 1).cast("double")
        / 1000000001
    )
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.round(-F.log(u) / F.col("n_chars") * F.lit(1e12)).cast("bigint").alias("key_i12"),
    )
    return (
        rank_after_limit(
            keyed, [F.col("key_i12"), F.col("doc_id")], WSAMPLE_K, rank_col="sample_rank"
        )
        .select(
            "sample_rank",
            "doc_id",
            "n_chars",
            (F.col("key_i12").cast("double") / F.lit(1e12)).alias("race_key"),
        )
        .orderBy("sample_rank")
    )


# --- SCD2 history build (validity intervals from a change stream) ---------


@query(
    "scd2_status_history",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey AS custkey, o_orderstatus AS status,
             o_orderdate, o_orderkey,
             LAG(o_orderstatus) OVER w AS prev_status
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), flagged AS (
      SELECT *, CASE WHEN prev_status IS NULL
                       OR prev_status <> status THEN 1 ELSE 0 END AS chg
      FROM ordered
    ), versioned AS (
      SELECT *, SUM(chg) OVER (PARTITION BY custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS version
      FROM flagged
    ), spans AS (
      SELECT custkey, CAST(version AS INT) AS version, status,
             MIN(o_orderdate) AS valid_from,
             COUNT(*) AS n_orders
      FROM versioned GROUP BY custkey, version, status
    )
    SELECT custkey, version, status, valid_from,
           LEAD(valid_from) OVER (PARTITION BY custkey ORDER BY version)
             AS valid_to,
           CAST(n_orders AS BIGINT) AS n_orders,
           LEAD(valid_from) OVER (PARTITION BY custkey ORDER BY version)
             IS NULL AS is_current
    FROM spans
    ORDER BY custkey, version
    """,
)
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build from a change stream — the
    standard lakehouse dimension-history pattern (Kimball SCD2): collapse
    each customer's order-status sequence into validity intervals
    [valid_from, valid_to) with a version number, one row per
    consecutive-status run, flagging the open (current) interval.
    Complements ``merge_upsert_latest_state`` (SCD1 latest-wins): SCD1
    answers "what is the state", SCD2 answers "what was it when".

    Determinism: the change ordering is the total order (o_orderdate,
    o_orderkey); versions are integer prefix sums of change flags; no
    floats anywhere.

    Scale shape: every window partitions by custkey — entity-sized
    groups (~10 rows each at any corpus size; a customer's history is
    bounded), never data-sized; one hash shuffle on custkey reused by
    all three window/agg steps (same-key windows and groupBy pipeline
    on one exchange). At 100 TB this is the daily dimension rebuild:
    new CDC rows append, only affected custkeys recompute."""
    w = Window.partitionBy("custkey").orderBy("o_orderdate", "o_orderkey")
    ordered = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        "o_orderdate",
        "o_orderkey",
    ).withColumn("prev_status", F.lag("status").over(w))
    versioned = ordered.withColumn(
        "chg",
        F.when(
            F.col("prev_status").isNull() | (F.col("prev_status") != F.col("status")),
            1,
        ).otherwise(0),
    ).withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
    spans = versioned.groupBy("custkey", "version", "status").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    wv = Window.partitionBy("custkey").orderBy("version")
    return (
        spans.withColumn("valid_to", F.lead("valid_from").over(wv))
        .select(
            "custkey",
            "version",
            "status",
            "valid_from",
            "valid_to",
            "n_orders",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("custkey", "version")
    )


@query(
    "data_expectations_report",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem_discount_range' AS check_name,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_fk_orderkey',
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
             CAST((SELECT COUNT(*) FROM lineitem l
                   WHERE NOT EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
      UNION ALL
      SELECT 'lineitem_qty_range',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders_fk_custkey',
             CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
      UNION ALL
      SELECT 'orders_pk_unique',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders_status_domain',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders_totalprice_positive',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
    )
    SELECT check_name, n_checked, n_violations,
           CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM checks
    ORDER BY check_name
    """,
)
def data_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract suite (the dbt-test / Great Expectations
    shape): one row per expectation — primary-key uniqueness,
    referential integrity both directions, value domains, and range
    checks — with checked/violation counts and a pass/fail verdict, so
    a pipeline gate can consume the report directly.

    Determinism: every check is integer counting; the verdict is a CASE
    on an exact count.

    Scale shape: each expectation is one scan-collapse (conditional-sum
    aggregate or LEFT ANTI join count) over its table; the report is
    the UNION of one-row frames. The two FK checks are anti-joins on
    the join keys — broadcast when the dimension fits, shuffle
    otherwise; nothing holds more than an aggregate."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")

    def check(name: str, df) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n_checked").cast("bigint"),
            F.col("n_violations").cast("bigint"),
        )

    pk = orders.agg(
        F.count("*").alias("n_checked"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("n_violations"),
    )
    fk_cust = orders.agg(F.count("*").alias("n_checked")).crossJoin(
        F.broadcast(
            orders.join(
                cust, orders.o_custkey == cust.c_custkey, "left_anti"
            ).agg(F.count("*").alias("n_violations"))
        )
    )
    fk_ord = li.agg(F.count("*").alias("n_checked")).crossJoin(
        F.broadcast(
            li.join(
                orders, li.l_orderkey == orders.o_orderkey, "left_anti"
            ).agg(F.count("*").alias("n_violations"))
        )
    )
    price = orders.agg(
        F.count("*").alias("n_checked"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("n_violations"),
    )
    status = orders.agg(
        F.count("*").alias("n_checked"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")
        ).alias("n_violations"),
    )
    qty = li.agg(
        F.count("*").alias("n_checked"),
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("bigint")
        ).alias("n_violations"),
    )
    disc = li.agg(
        F.count("*").alias("n_checked"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)).cast("bigint")
        ).alias("n_violations"),
    )
    report = (
        check("orders_pk_unique", pk)
        .unionByName(check("orders_fk_custkey", fk_cust))
        .unionByName(check("lineitem_fk_orderkey", fk_ord))
        .unionByName(check("orders_totalprice_positive", price))
        .unionByName(check("orders_status_domain", status))
        .unionByName(check("lineitem_qty_range", qty))
        .unionByName(check("lineitem_discount_range", disc))
    )
    return report.select(
        "check_name",
        "n_checked",
        "n_violations",
        F.when(F.col("n_violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    ).orderBy("check_name")
