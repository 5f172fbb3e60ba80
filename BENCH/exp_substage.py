"""One-off: sub-stage wall decomposition of the pipeline at N vs 4N.

Usage: python BENCH/exp_substage.py local[4] /dev/shm/exp_n
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel
from pyspark.sql import functions as F

from rdfshape_api_spark.fixtures import ensure_fixtures
from rdfshape_api_spark.fixtures.generator import (
    SHACL_SENSOR,
    SHAPEMAP_QUERY,
    SHEX_SENSOR,
)
from rdfshape_api_spark.lineage import extraction_lineage
from rdfshape_api_spark.model import TRIPLE_COLUMNS
from rdfshape_api_spark.operators.canonicalize import canonicalize, write_canonical_store
from rdfshape_api_spark.plans import parse_shacl, parse_shexc
from rdfshape_api_spark.plans.validate import validate_batch
from rdfshape_api_spark.session import get_spark
from rdfshape_api_spark.sources.extract import extract_triples_raw, with_doc_sha

master, out = sys.argv[1], sys.argv[2]
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)
spark = get_spark("exp", master=master, shuffle_partitions=64)

# warm-up (small)
wdocs = spark.read.parquet(ensure_fixtures("sf0.1")["docs"])
extract_triples_raw(with_doc_sha(wdocs)).count()

walls: dict[str, float] = {}


def step(name):
    class _T:
        def __enter__(self):
            self.t0 = time.time()

        def __exit__(self, *e):
            walls[name] = round(time.time() - self.t0, 2)
            print(name, walls[name], flush=True)

    return _T()


docs = spark.read.parquet(ensure_fixtures("sf1")["docs"])

with step("1_prepare_persist"):
    prepared = with_doc_sha(docs).repartitionByRange(64, "repo", "path").persist(
        StorageLevel.DISK_ONLY
    )
    prepared.count()

with step("2_extract_write_raw"):
    extract_triples_raw(prepared).write.mode("overwrite").parquet(out + "/raw")

with step("3_lineage"):
    extraction_lineage(prepared, spark.read.parquet(out + "/raw")).write.mode(
        "overwrite"
    ).parquet(out + "/lineage")
prepared.unpersist()

raw = spark.read.parquet(out + "/raw")
with step("4_errors_write"):
    raw.filter(F.col("error").isNotNull()).select(
        "repo", "path", "commit", "doc_sha256", "error"
    ).write.mode("overwrite").parquet(out + "/errors")

with step("5_canon_store_write"):
    canon = canonicalize(raw.filter(F.col("error").isNull()).select(*TRIPLE_COLUMNS))
    write_canonical_store(canon, out + "/store", subj_buckets=16, dedup=True)

with step("6_store_read_validate_write"):
    triples = spark.read.parquet(out + "/store").select(*TRIPLE_COLUMNS)
    jobs = [
        (parse_shexc(SHEX_SENSOR), SHAPEMAP_QUERY, "shex_sensor"),
        (parse_shacl(SHACL_SENSOR), None, "shacl_sensor"),
    ]
    validate_batch(triples, jobs).write.mode("overwrite").parquet(out + "/verdicts")

with step("7_metrics"):
    lineage = spark.read.parquet(out + "/lineage")
    lineage.agg(F.sum("input_docs"), F.sum("output_triples")).collect()
    spark.read.parquet(out + "/verdicts").count()

print(json.dumps({"master": master, "walls": walls, "total": round(sum(walls.values()), 2)}))
spark.stop()
shutil.rmtree(out, ignore_errors=True)
