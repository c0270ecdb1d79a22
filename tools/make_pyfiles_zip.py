"""Build dist/globalign_spark.zip for ``spark-submit --py-files``.

Packages the whole ``globalign_spark`` package — including the vendored
``data/scoring_matrices/*.mtx`` — into one deflated zip so a cluster
submit needs exactly two artifacts: this zip and ``globalign_spark/main.py``
(copied anywhere; it imports the package from the zip).

    spark-submit --master yarn --py-files dist/globalign_spark.zip \
        main.py --warehouse s3://bucket/er_wh --pages-table iceberg.db.pages
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: str | Path | None = None) -> Path:
    pkg = REPO / "globalign_spark"
    out = Path(out) if out else REPO / "dist" / "globalign_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*")):
            if not p.is_file() or "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
