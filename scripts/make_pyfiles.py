"""Package the engine for cluster submission:

    python scripts/make_pyfiles.py          # -> dist/raster2dggs_spark.zip
    spark-submit --py-files dist/raster2dggs_spark.zip \\
        scripts/submit_flagship.py <images_parquet> <out_dir> [res]

The zip ships only the package (no tests/fixtures); executors import it
from the shipped archive (north rule: jobs run via spark-submit
--py-files).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "raster2dggs_spark.zip")
    pkg = os.path.join(REPO, "raster2dggs_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    fp = os.path.join(dirpath, fn)
                    z.write(fp, os.path.relpath(fp, REPO))
    print(out)


if __name__ == "__main__":
    main()
