"""Hand-checkable semantics for the time-decayed/time-weighted operators
(ewma_user_value, twap_user_daily): the oracle proves engine parity;
these prove the recurrences compute the textbook quantities on inputs
small enough to verify with a calculator."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_ewma_fold_matches_textbook_recurrence(spark):
    # values 100, 200, 300 (cents) -> s1=100; s2=.75*100+.25*200=125;
    # s3=.75*125+.25*300=168.75
    vals = spark.createDataFrame([([100.0, 200.0, 300.0],)], "vals array<double>")
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: acc * 0.75 + x * 0.25,
    )
    assert vals.select(ewma.alias("e")).collect()[0].e == 168.75


def test_twap_weights_by_holding_duration(spark):
    # user holds value 10 for 30 s, then value 40 for 10 s, then a final
    # event (no successor -> contributes no segment).
    # TWAP = (10*30 + 40*10) / 40 = 17.5  — the COUNT-average would be 25.
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "e1", 10.0),
        (1, datetime(2026, 1, 1, 0, 0, 30), "e2", 40.0),
        (1, datetime(2026, 1, 1, 0, 0, 40), "e3", 99.0),
    ]
    base = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id string, value double"
    ).withColumn("day", F.to_date("ts"))
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    mic = F.unix_micros(F.col("ts"))
    dur = F.lead(mic).over(w) - mic
    iv = F.round(F.col("value") * 1e4).cast("bigint")
    seg = base.select("user_id", "day", iv.alias("iv"), dur.alias("dur")).filter(
        F.col("dur").isNotNull()
    )
    out = (
        seg.groupBy("user_id", "day")
        .agg(F.sum(F.col("iv") * F.col("dur")).alias("swv"), F.sum("dur").alias("sw"))
        .select((F.col("swv").cast("double") / F.col("sw") / 1e4).alias("twap"))
        .collect()
    )
    assert len(out) == 1
    assert abs(out[0].twap - 17.5) < 1e-12


def test_linear_attribution_conserves_revenue(spark, sf_dir):
    """Credited + direct revenue must equal total purchase revenue up to
    the documented truncation dust (n_pairs * 1e-6 cents)."""
    from bigdata_2025_1_spark.operators.events_ops import (
        linear_attribution_revenue,
    )

    rows = linear_attribution_revenue(spark, sf_dir).collect()
    credited = sum(r.credited_revenue for r in rows)
    n_pairs = sum(r.n_touches for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = (
        ev.filter(F.col("event_type") == "purchase")
        .selectExpr("sum(cast(round(value * 100) as bigint)) as c")
        .collect()[0]
        .c
        / 100.0
    )
    dust = n_pairs * 1e-8 + 1e-6
    assert total - dust <= credited <= total + 1e-6, (credited, total)
    assert {r.touch_type for r in rows} <= {"view", "click", "direct"}


def test_negative_samples_never_hit_positives(spark, sf_dir):
    from bigdata_2025_1_spark.operators.pipeline_ops import (
        NEG_K,
        negative_sampling_pairs,
    )

    out = negative_sampling_pairs(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pos = {
        (r.o_custkey, r.l_partkey)
        for r in orders.join(
            li, li["l_orderkey"] == orders["o_orderkey"]
        )
        .select("o_custkey", "l_partkey")
        .collect()
    }
    per_user: dict[int, list[int]] = {}
    for r in out:
        assert (r.custkey, r.neg_partkey) not in pos
        per_user.setdefault(r.custkey, []).append(r.draw_idx)
    for u, idxs in per_user.items():
        assert idxs == list(range(len(idxs)))  # dense, ordered draw idx
        assert len(idxs) <= NEG_K
