"""Benchmark harness (driver contract + BASELINE.md protocol).

Default run: headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``; prints ONE JSON line
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

``python bench.py --scaling`` additionally runs the end-to-end pipeline at
two parallelism levels (local[8] vs local[32] — the sandbox stand-in for N
vs 4N executors per the driver instruction) and writes BENCH/BASELINE.md
with throughput + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _force(df) -> int:
    """Execute a DataFrame fully without materializing to the driver."""
    return df._jdf.queryExecution().toRdd().count()


def _bench_queries(spark, sf_dir: str) -> tuple[dict, dict]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    headline = [
        "rdf_extract_canonical",
        "rdf_validate_shex",
        "rdf_validate_shacl",
        "rdf_ntriples",
        "rdf_hub_degree",
        "text_features",
        "dedup_exact",
        "dedup_lsh_pairs",
        "sim_cosine_topk",
        "mm_features",
        "events_hourly",
    ]
    timings, rows = {}, {}
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        rows[name] = n
    return timings, rows


def _run_pipeline_once(master: str, sf_tag: str, out_dir: str) -> dict:
    """Fresh-session end-to-end pipeline run (extract+validate+canonicalize)."""
    from rdfshape_api_spark.fixtures import ensure_fixtures
    from rdfshape_api_spark.fixtures.generator import (
        SHACL_SENSOR,
        SHAPEMAP_QUERY,
        SHEX_SENSOR,
    )
    from rdfshape_api_spark.pipeline import run_pipeline
    from rdfshape_api_spark.session import get_spark

    paths = ensure_fixtures(sf_tag)
    spark = get_spark("bench_pipeline", master=master)
    docs = spark.read.parquet(paths["docs"])
    t0 = time.time()
    m = run_pipeline(
        spark,
        docs,
        out_dir,
        shex_schema=SHEX_SENSOR,
        shex_shapemap=SHAPEMAP_QUERY,
        shacl_schema=SHACL_SENSOR,
        repartition_by_repo=spark.sparkContext.defaultParallelism * 2,
        resume=False,
    )
    m["total_wall_s"] = round(time.time() - t0, 3)
    m["throughput_tps"] = round(m["triples"] / m["total_wall_s"], 1)
    m["master"] = master
    spark.stop()
    return m


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")

    if "--scaling" in sys.argv:
        _scaling(sf_dir)
        return

    from rdfshape_api_spark.fixtures import ensure_fixtures
    from rdfshape_api_spark.session import get_spark

    ensure_fixtures(sf_dir)  # exclude generation from timings
    spark = get_spark("bench", master=f"local[{cpus}]")
    t0 = time.time()
    timings, rows = _bench_queries(spark, sf_dir)
    total = round(time.time() - t0, 3)

    # end-to-end pipeline throughput in the same session
    import shutil
    import tempfile

    from rdfshape_api_spark.fixtures.generator import (
        SHACL_SENSOR,
        SHAPEMAP_QUERY,
        SHEX_SENSOR,
        ensure_fixtures as ef,
        sf_tag_from_dir,
    )
    from rdfshape_api_spark.pipeline import run_pipeline

    out = tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        docs = spark.read.parquet(ef(sf_tag_from_dir(sf_dir))["docs"])
        t1 = time.time()
        m = run_pipeline(
            spark,
            docs,
            out,
            shex_schema=SHEX_SENSOR,
            shex_shapemap=SHAPEMAP_QUERY,
            shacl_schema=SHACL_SENSOR,
            resume=False,
        )
        pipe_wall = round(time.time() - t1, 3)
        timings["pipeline_end_to_end"] = pipe_wall
        tps = round(m["triples"] / pipe_wall, 1)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(total + pipe_wall, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pipeline_triples_per_sec": tps,
                "pipeline_triples": m["triples"],
                "rows": rows,
            }
        )
    )


def _scaling(sf_dir: str) -> None:
    """Two-parallelism-level protocol (BASELINE.md): same job, same input,
    local[8] (N) vs local[32] (4N)."""
    import shutil
    import tempfile

    from rdfshape_api_spark.fixtures.generator import sf_tag_from_dir

    sf_tag = sf_tag_from_dir(sf_dir)
    results = {}
    for label, master in [("N(8)", "local[8]"), ("4N(32)", "local[32]")]:
        out = tempfile.mkdtemp(prefix=f"scaling_{label.split('(')[0]}_")
        try:
            results[label] = _run_pipeline_once(master, sf_tag, out)
        finally:
            shutil.rmtree(out, ignore_errors=True)
    t_n = results["N(8)"]["total_wall_s"]
    t_4n = results["4N(32)"]["total_wall_s"]
    eff = round((t_n / t_4n) / 4.0, 3)
    report = {
        "N_cores": 8,
        "4N_cores": 32,
        "wall_N_s": t_n,
        "wall_4N_s": t_4n,
        "throughput_N_tps": results["N(8)"]["throughput_tps"],
        "throughput_4N_tps": results["4N(32)"]["throughput_tps"],
        "scaling_efficiency": eff,
        "triples": results["4N(32)"]["triples"],
        "sf": sf_tag,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = [
        "# BENCH/BASELINE.md — measured baseline (protocol per BASELINE.md)",
        "",
        f"End-to-end pipeline (extract + validate ShEx&SHACL + canonicalize + store) on the",
        f"deterministic `{sf_tag}` RDF docs table, identical input at two parallelism levels",
        "(sandbox stand-in for N vs 4N executors):",
        "",
        "| level | master | wall (s) | triples | throughput (triples/s) |",
        "|---|---|---|---|---|",
        f"| N | local[8] | {t_n} | {results['N(8)']['triples']} | {results['N(8)']['throughput_tps']} |",
        f"| 4N | local[32] | {t_4n} | {results['4N(32)']['triples']} | {results['4N(32)']['throughput_tps']} |",
        "",
        f"**Scaling efficiency (T_N / T_4N) / 4 = {eff}** (target ≥ 0.8 per north rule;",
        "local-mode caveat: all 'executors' share one JVM + page cache, and Spark session",
        "fixed costs (~10 s) are included in both walls, which depresses the ratio vs a",
        "real cluster).",
        "",
        "```json",
        json.dumps(report, indent=2),
        "```",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
