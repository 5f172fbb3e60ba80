"""North-star P/R gate: emitted triples vs the golden emitter."""

from __future__ import annotations

from rdfshape_api_spark.lineage import triple_precision_recall


def test_pipeline_pr_is_exact(spark, fixtures_001, triples_001):
    golden = spark.read.parquet(fixtures_001["triples"])
    pr = triple_precision_recall(triples_001, golden)
    assert pr["precision"] == 1.0
    assert pr["recall"] == 1.0
    assert pr["triples_emitted"] == pr["triples_expected"]


def test_pr_detects_drift(spark, fixtures_001, triples_001):
    from pyspark.sql import functions as F

    golden = spark.read.parquet(fixtures_001["triples"])
    # corrupt 1 doc's triples → precision and recall both dip below 1
    corrupted = triples_001.withColumn(
        "obj_value",
        F.when(F.col("pred").endswith("status"), F.concat(F.col("obj_value"), F.lit("_X")))
        .otherwise(F.col("obj_value")),
    )
    pr = triple_precision_recall(corrupted, golden)
    assert pr["precision"] < 1.0 and pr["recall"] < 1.0
    assert pr["precision"] > 0.8  # only the status triples drifted
