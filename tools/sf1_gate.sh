#!/usr/bin/env bash
# One-command sf1 oracle gate (the round-4 "scale proof" made a habit):
#   gen-if-absent -> dump every SparkEntry query -> DuckDB compare.
#
#   tools/sf1_gate.sh [sfDir] [outDir]
#     sfDir   default data/sf1      (SfGen-generated, gitignored)
#     outDir  default /tmp/verify_sf1
#
# Heavy bits: full Verify at sf1 is minutes (d08/d09 dominate), and
# d09's ~160M-pair result makes check_oracle.py take the DuckDB-side
# EXCEPT ALL path. SPARK_DRIVER_MEM (default 16g here) sizes the forked
# JVM heap via build.sbt.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR=${1:-data/sf1}
OUT_DIR=${2:-/tmp/verify_sf1}

if [ ! -f "$SF_DIR/lineitem.parquet" ]; then
  echo "== $SF_DIR absent: generating with SfGen (sf=1.0) =="
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} \
    sbt -batch "runMain graft.datagen.SfGen $SF_DIR 1.0"
fi

rm -rf "$OUT_DIR"
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR"
