"""Build pysemantic_spark.zip for `spark-submit --py-files`.

    python tools/build_pyfiles.py [out.zip]
    spark-submit --py-files dist/pysemantic_spark.zip \
        your_job.py  # or: python -m pysemantic_spark.cli validate ...

Pure-Python package, no JVM artifacts — the whole engine ships as one zip.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "pysemantic_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "pysemantic_spark.zip")
    print(build(out))
