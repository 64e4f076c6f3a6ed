"""Package the engine for spark-submit (north rule: 'ships as spark-submit
--py-files to a multi-executor cluster').

Usage:
    python scripts/make_pyfiles.py [out.zip]
    spark-submit --py-files dist/dedupe_archived_files_spark.zip \
        scripts/run_job.py --input <pages_table> --output <clusters_table>
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist", "dedupe_archived_files_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "dedupe_archived_files_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
