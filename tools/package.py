"""Package the engine for ``spark-submit --py-files`` (the north-star
deployment mode).

Builds ``dist/rdfshape_api_spark.zip`` containing the package (sources
only, no fixtures/tests) and prints the submit command.

Usage: python tools/package.py [--print-only]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "rdfshape_api_spark"


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


SUBMIT_TEMPLATE = """\
spark-submit \\
  --master <cluster-master> \\
  --deploy-mode cluster \\
  --py-files {zip_path} \\
  --conf spark.sql.adaptive.enabled=true \\
  --conf spark.sql.adaptive.skewJoin.enabled=true \\
  --conf spark.sql.shuffle.partitions=<2-3x total executor cores> \\
  --conf spark.sql.execution.arrow.pyspark.enabled=true \\
  {repo}/rdfshape_api_spark/pipeline.py <docs_table_or_path> <output_dir>
"""


def main() -> None:
    if "--print-only" in sys.argv:
        print(SUBMIT_TEMPLATE.format(zip_path="dist/rdfshape_api_spark.zip", repo=REPO))
        return
    path = build_zip()
    n = len(zipfile.ZipFile(path).namelist())
    print(f"built {path} ({n} files)")
    print(SUBMIT_TEMPLATE.format(zip_path=path, repo=REPO))


if __name__ == "__main__":
    main()
