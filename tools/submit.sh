#!/usr/bin/env bash
# Example spark-submit launch (local[*] here; swap --master for a
# real cluster and size --conf per docs/SCALE.md). The zip is the
# only artifact executors need.
set -euo pipefail
cd "$(dirname "$0")/.."
python tools/package_pyfiles.py
exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --driver-memory "${DRIVER_MEMORY:-4g}" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-8}" \
  --conf spark.sql.adaptive.enabled=true \
  --py-files dist/larbin_spark.zip \
  run_crawl.py "$@"
