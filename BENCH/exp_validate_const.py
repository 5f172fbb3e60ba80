"""Decompose the validation stage's level-independent driver constant.

The sf1 scaling runs show the validate stage at ~13 s (N=4) vs ~6 s
(4N=16): a ratio near 2x where the 4x-input probe shows the same plan's
compute scales at 0.93 (ANALYSIS.md:78-101) — so roughly 3-4 s of each
run is a constant that does not shrink with parallelism.  This probe
times the candidate components separately on a TINY input (constants
dominate, compute ~0):

  parse      — ShExC + SHACL schema text -> IR (pure Python)
  build      — validate_batch DataFrame construction (py4j expression tree)
  optimize   — Catalyst analysis + optimization + physical planning
  execute    — the action itself on ~100 docs (scheduling + commit floor)

Run: python BENCH/exp_validate_const.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from rdfshape_api_spark.fixtures import ensure_fixtures
    from rdfshape_api_spark.fixtures.generator import (
        SHACL_SENSOR,
        SHAPEMAP_QUERY,
        SHEX_SENSOR,
    )
    from rdfshape_api_spark.session import get_spark
    from rdfshape_api_spark.sources.extract import extract_triples

    spark = get_spark("exp_validate_const", master="local[4]", shuffle_partitions=64)
    paths = ensure_fixtures("sf0.001")
    docs = spark.read.parquet(paths["docs"]).limit(100)
    triples = extract_triples(docs).localCheckpoint()  # tiny, materialized

    from rdfshape_api_spark.plans import parse_shacl, parse_shexc
    from rdfshape_api_spark.plans.validate import validate_batch

    out = {}
    for rep in range(3):
        t0 = time.time()
        shex = parse_shexc(SHEX_SENSOR)
        shacl = parse_shacl(SHACL_SENSOR)
        t1 = time.time()
        jobs = [(shex, SHAPEMAP_QUERY, "shex_sensor"), (shacl, None, "shacl_sensor")]
        v = validate_batch(triples, jobs, focus_triples=triples)
        t2 = time.time()
        v._jdf.queryExecution().executedPlan()  # force analyze+optimize+plan
        t3 = time.time()
        with tempfile.TemporaryDirectory() as td:
            v.write.mode("overwrite").parquet(td + "/v")
        t4 = time.time()
        out[f"rep{rep}"] = {
            "parse_s": round(t1 - t0, 3),
            "build_s": round(t2 - t1, 3),
            "optimize_s": round(t3 - t2, 3),
            "execute_s": round(t4 - t3, 3),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
