"""Zip the engine for cluster submission:

    python tools/package.py
    spark-submit --py-files dist/atlas_spark.zip your_job.py

(`python -m atlas_spark.cli replay -c engine.toml` is the local
equivalent; on a cluster the same CLI runs inside the driver.)
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "atlas_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "atlas_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
