"""One-off: is the canonicalize/dedup shuffle memory-bandwidth-bound?

Round-4 runs 9/10 measured the 4x-input canonicalize stage at 0.30-0.33
scaling (4 -> 16 cores) while CPU-bound kernels in the same window read
0.75-0.98.  Hypothesis (BENCH/BASELINE.md, run-10 note): a shuffle of
50.7M mostly-unique rows is serialize + hash + fetch — DRAM-bus work the
CPU burn's ceiling does not bound.  This script measures both sides:

  python BENCH/exp_membw.py membw          # memory-bandwidth ceiling burn
  python BENCH/exp_membw.py prepare        # build sf1 raw triples once
  python BENCH/exp_membw.py kernel local[4] 64    # isolated dedup_4x kernel
  python BENCH/exp_membw.py kernel local[16] 256  # ... at another lever setting

The membw burn: k workers each memcpy a 128 MB numpy buffer for a fixed
wall; aggregate GB/s at k=4 vs k=16 is the bandwidth analogue of
bench._cpu_ceiling (same settle-and-best-denominator protocol).  If the
box's DRAM ratio for 4->16 is ~1.3x while CPU is ~3.7x, a 0.33 shuffle
kernel is the memory ceiling, not a plan flaw — a real 4x-executor fleet
brings 4x memory buses.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RAW_PATH = "/dev/shm/exp_membw_raw_sf1"


def _copy_worker(args: tuple[float, int]) -> tuple[int, float]:
    secs, mb = args
    import numpy as np

    src = np.zeros(mb * 1024 * 1024, dtype=np.uint8) + 1
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault both buffers' pages in BEFORE timing
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        np.copyto(dst, src)
        n += 1
    return n * mb, time.time() - t0  # MB moved, actual elapsed


def membw(n: int = 4, n4: int = 16, secs: float = 3.0, mb: int = 64) -> dict:
    import multiprocessing as mp

    def agg(k: int) -> float:
        with mp.Pool(k) as p:
            res = p.map(_copy_worker, [(secs, mb)] * k)
        mean_el = sum(r[1] for r in res) / k
        return sum(r[0] for r in res) / mean_el / 1024.0  # GB/s aggregate

    a_n1 = agg(n)
    time.sleep(3.0)
    a_n4 = agg(n4)
    time.sleep(3.0)
    a_n2 = agg(n)
    best_n = max(a_n1, a_n2)
    return {
        "n_workers": n,
        "n4_workers": n4,
        "gbps_n_first": round(a_n1, 2),
        "gbps_n4": round(a_n4, 2),
        "gbps_n_second": round(a_n2, 2),
        "membw_ratio": round(a_n4 / best_n, 2),
    }


def prepare() -> None:
    from pyspark.sql import functions as F

    from rdfshape_api_spark.fixtures import ensure_fixtures
    from rdfshape_api_spark.model import TRIPLE_COLUMNS
    from rdfshape_api_spark.session import get_spark
    from rdfshape_api_spark.sources.extract import extract_triples_raw, with_doc_sha

    spark = get_spark("exp_membw_prep", master="local[16]", shuffle_partitions=64)
    docs = with_doc_sha(spark.read.parquet(ensure_fixtures("sf1")["docs"])).repartition(64)
    (
        extract_triples_raw(docs)
        .filter(F.col("error").isNull())
        .select(*TRIPLE_COLUMNS)
        .write.mode("overwrite")
        .parquet(RAW_PATH)
    )
    print("prepared", RAW_PATH, flush=True)
    spark.stop()


def kernel(master: str, shuffle_partitions: int) -> dict:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from rdfshape_api_spark.operators.canonicalize import canonicalize, dedup_triples
    from rdfshape_api_spark.session import get_spark

    spark = get_spark("exp_membw", master=master, shuffle_partitions=shuffle_partitions)
    raw = spark.read.parquet(RAW_PATH).persist(StorageLevel.DISK_ONLY)
    raw.count()
    raw4 = (
        raw.crossJoin(spark.range(4).select(F.col("id").cast("string").alias("_salt")))
        .withColumn("doc_sha256", F.concat_ws("-", "doc_sha256", "_salt"))
        .drop("_salt")
    )

    def run() -> int:
        return dedup_triples(canonicalize(raw4), scope_doc=True).count()

    run()  # JIT warm-up
    walls, rows = [], 0
    for _ in range(2):
        t0 = time.time()
        rows = run()
        walls.append(round(time.time() - t0, 3))
    spark.stop()
    return {
        "master": master,
        "shuffle_partitions": shuffle_partitions,
        "rows": rows,
        "walls": walls,
        "wall_s": min(walls),
    }


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "membw":
        print(json.dumps(membw()))
    elif mode == "prepare":
        prepare()
    elif mode == "kernel":
        print(json.dumps(kernel(sys.argv[2], int(sys.argv[3]))))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
