"""Package automatedreclin_spark into a --py-files zip for spark-submit."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DIST = REPO / "dist"


def main() -> None:
    DIST.mkdir(exist_ok=True)
    out = DIST / "automatedreclin_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "automatedreclin_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    print(f"wrote {out} ({out.stat().st_size:,} bytes)")


if __name__ == "__main__":
    main()
