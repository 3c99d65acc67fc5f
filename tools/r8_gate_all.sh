#!/usr/bin/env bash
# Round-8 end-of-round evidence, all at ONE HEAD (the r4-r7 verdicts'
# "land-after-the-gate" fix): full suite -> sf0.01 oracle gate -> sf1
# oracle gate -> timed bench at sf0.1 and sf1, artifacts under bench/.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== HEAD: $(git rev-parse HEAD) =="

echo "== 1/5 full suite =="
sbt -batch test 2>&1 | grep -E "Tests:|All tests|FAILED"

echo "== 2/5 sf0.01 oracle gate =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r8_final" > /tmp/r8_verify01.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r8_final | tee bench/r8_sf01_oracle_full.txt | tail -2

echo "== 3/5 sf1 oracle gate =="
rm -rf /tmp/verify_r8_sf1
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.Verify data/sf1 /tmp/verify_r8_sf1" > /tmp/r8_verify_sf1.log 2>&1
python3 tools/check_oracle.py data/sf1 /tmp/verify_r8_sf1 | tee bench/r8_sf1_oracle_full.txt | tail -2

bench_run() { # sfdir tag
  SPARK_GRAFT_SF_DIR="$1" sbt -batch "runMain graft.Bench" > "/tmp/r8_bench_$2.log" 2>&1
  cp bench/last_bench.json "bench/r8_$2.json"
  grep -o 'runs {"runs":.*' "/tmp/r8_bench_$2.log" | tail -1 | sed 's/^runs //' > "bench/r8_$2_runs.json"
  python3 -c "import json;d=json.load(open('bench/r8_$2.json'));print('$2 total', d['value'], len(d['queries']), 'cells')"
}

echo "== 4/5 bench sf0.1 =="
bench_run /root/testdata/sf0.1 sf0.1

echo "== 5/5 bench sf1 =="
bench_run data/sf1 sf1

echo "== ALL GATES DONE at $(git rev-parse HEAD) =="
