#!/usr/bin/env python
"""Build the --py-files artifact: a reproducible osmcoastline_spark.zip.

    python tools/make_pyfiles.py [dest.zip]        (default dist/osmcoastline_spark.zip)
    spark-submit --py-files dist/osmcoastline_spark.zip \
        /path/to/osmcoastline_spark/cli.py --nodes ... --ways ... -o out/

Reproducible by construction: entries are sorted, timestamps fixed, and
__pycache__/bytecode excluded — the same tree always produces the same
bytes, so the artifact can be content-addressed by a deploy pipeline.
tests/test_spark_submit.py launches a REAL `spark-submit --py-files` run
off this zip from a directory where the package is NOT otherwise
importable, so the packaging path stays exercised.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "osmcoastline_spark")
FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # any constant; reproducibility only


def build(dest: str) -> str:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    entries = []
    for root, dirs, files in os.walk(PKG):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(root, f)
            entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return dest


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "osmcoastline_spark.zip"
    )
    print(build(dest))
