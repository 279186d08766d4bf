"""IVF scale story, substantiated: write the corpus partitioned by its
quantizer cell and a probe's candidate read must PRUNE partitions — the
layout that turns ann_ivf_topk's candidate scan into ~nprobe/cells of
the data at 100 TB (SCALE.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import vectors as V
from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.operators.similarity import N_CELLS, N_PROBE, _CENTROIDS
from bigdata_2025_1_spark.plans.explain import formatted_plan


def test_ivf_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    cell_pd = V.make_ivf_cell_pandas(_CENTROIDS)
    corpus = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", cell_pd(F.col("embedding"))["cell"].alias("cell")
    )
    path = str(tmp_path / "ivf_corpus")
    corpus.write.partitionBy("cell").parquet(path)

    probes_pd = V.make_ivf_probes_pandas(_CENTROIDS, N_PROBE)
    probe_cells = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.explode(probes_pd(F.col("embedding"))["cells"]).alias("cell"))
        .collect()
    )
    cells = [r.cell for r in probe_cells]
    assert len(cells) == N_PROBE

    scan = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    plan = formatted_plan(scan)
    # the cell filter is a partition filter (pruning), not a data filter
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    # and the scan actually reads only the probed fraction of partitions
    n_read = scan.select(F.input_file_name().alias("f")).distinct().count()
    n_total = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert n_read < n_total, (n_read, n_total)
    assert n_read <= N_PROBE * max(1, n_total // N_CELLS) + N_PROBE, (n_read, n_total)
