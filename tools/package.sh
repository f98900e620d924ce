#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/lightrag_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/lightrag_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("lightrag_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/lightrag_spark.zip")
EOF
