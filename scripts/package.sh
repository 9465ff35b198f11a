#!/bin/sh
# Build dist/timberline_spark.zip for `spark-submit --py-files`.
#
#   spark-submit --py-files dist/timberline_spark.zip \
#       run_pipeline.py --sf-dir ... --out ... --run-id ...
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/timberline_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted((root / "timberline_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/timberline_spark.zip")
EOF
