#!/usr/bin/env bash
# spark-submit launch wrapper (north_rule deployment shape).
# Usage: jobs/submit.sh <input> <results> <checkpoint> [metrics]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"

# package the library for executors
ZIP="/tmp/pypdfproc_spark.zip"
(cd "$REPO" && rm -f "$ZIP" && python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('pypdfproc_spark'):
        for f in files:
            if f.endswith(('.py', '.json')):
                p = os.path.join(root, f)
                z.write(p, p)
")

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=64 \
  "$REPO/jobs/extract.py" \
  --input "$1" --results "$2" --checkpoint "$3" \
  ${4:+--metrics "$4"}
