"""Arrow-optimized scalar Python UDF (useArrow=True): the sanctioned
fallback when logic truly needs per-value Python but doesn't fit the
pandas_udf batch shape. Pinned against the built-in expression so the
fallback can never silently diverge — and so the preference order
(built-in > pandas_udf > arrow udf > pickled row udf) stays documented
in code."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from bigdata_2025_1_spark.io import load


def test_arrow_udf_matches_builtin(spark, sf_dir):
    @F.udf(returnType=IntegerType(), useArrow=True)
    def token_count_py(text: str) -> int:
        return len(text.split()) if text else 0

    docs = load(spark, sf_dir, "documents").limit(200)
    both = docs.select(
        token_count_py("text").alias("via_udf"),
        F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != F.lit(""))).alias(
            "via_builtin"
        ),
    )
    # Python .split() and ASCII-\s splitting agree on the fixture corpus;
    # the assertion is exact row-for-row equality
    assert both.filter(F.col("via_udf") != F.col("via_builtin")).count() == 0
    plan = both._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # actually the Arrow path, not pickling


def test_apply_in_arrow_matches_grouped_agg(spark, sf_dir):
    """groupBy().applyInArrow (Spark 4): grouped map on raw pyarrow
    Tables — no pandas conversion layer at all. Pinned against the
    built-in aggregate, and the plan must show the Arrow path."""
    import pyarrow as pa

    def seg_stats(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bal = table.column("c_acctbal")
        return pa.table(
            {
                "c_mktsegment": [table.column("c_mktsegment")[0].as_py()],
                "n": pa.array([table.num_rows], type=pa.int64()),
                # floor, not round: pyarrow rounds half-to-even while
                # Spark rounds half-away — floor is identical in both
                "total_cents": pa.array(
                    [int(pc.sum(pc.floor(pc.multiply(bal, 100.0))).as_py())],
                    type=pa.int64(),
                ),
            }
        )

    c = load(spark, sf_dir, "customer")
    got = {
        r.c_mktsegment: (r.n, r.total_cents)
        for r in c.groupBy("c_mktsegment")
        .applyInArrow(seg_stats, "c_mktsegment string, n long, total_cents long")
        .collect()
    }
    expected = {
        r.c_mktsegment: (r.n, r.total_cents)
        for r in c.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("c_acctbal") * 100).cast("bigint")).alias("total_cents"),
        )
        .collect()
    }
    assert got == expected
