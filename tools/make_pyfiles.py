"""Package yargy_spark for spark-submit --py-files.

Usage: python tools/make_pyfiles.py  ->  dist/yargy_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, 'dist', 'yargy_spark.zip')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    src = os.path.join(ROOT, 'yargy_spark')
    with zipfile.ZipFile(out, 'w', zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(src):
            if '__pycache__' in dirpath:
                continue
            for name in sorted(files):
                # .parquet: the generated lexicon ships as package data
                # (yargy_spark/data/); executors load it through
                # importlib.resources so it must ride in the zip
                if not name.endswith(('.py', '.parquet')):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out


if __name__ == '__main__':
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
