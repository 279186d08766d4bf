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
