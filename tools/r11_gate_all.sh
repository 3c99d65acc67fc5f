#!/usr/bin/env bash
# Round-11 end-of-round evidence, all at ONE HEAD, ATOMIC (the r4-r8
# verdicts' "land-after-the-gate" fix, now with hard artifact checks):
# full suite -> sf0.01 oracle gate -> sf1 oracle gate -> timed bench at
# sf0.1 and sf1, artifacts under bench/.
#
# Rules (r8 verdict item 3):
#  - the ONLY commit after this script completes is the artifact commit;
#  - any further operator work re-runs the script;
#  - a truncated artifact must never be committed: every oracle gate
#    asserts its footer reads "== N pass, 0 fail ==" with N equal to
#    the oracle count the Verify dump declared, and both bench JSONs
#    must parse with their runs files present — the script EXITS
#    NONZERO otherwise, so there is nothing plausible to commit.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== HEAD: $(git rev-parse HEAD) =="

# footer_check <oracle_full.txt> <verify_out_dir>
footer_check() {
  local txt="$1" outdir="$2"
  python3 - "$txt" "$outdir" <<'EOF'
import json, re, sys
txt, outdir = sys.argv[1], sys.argv[2]
tail = open(txt).read().strip().splitlines()
assert tail, f"{txt}: empty artifact"
m = re.match(r"== (\d+) pass, (\d+) fail ==", tail[-1])
assert m, f"{txt}: no pass/fail footer (truncated artifact): last line {tail[-1]!r}"
npass, nfail = int(m.group(1)), int(m.group(2))
want = len(json.load(open(f"{outdir}/oracle_sql.json")))
assert nfail == 0, f"{txt}: {nfail} FAILURES"
assert npass == want, f"{txt}: {npass} pass != {want} oracle entries"
print(f"footer OK: {npass}/{want} pass, 0 fail")
EOF
}

echo "== 1/5 full suite =="
sbt -batch test 2>&1 | grep -E "Tests:|All tests|FAILED"

echo "== 2/5 sf0.01 oracle gate =="
rm -rf /tmp/verify_r11_final
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r11_final" > /tmp/r11_verify01.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r11_final | tee bench/r11_sf01_oracle_full.txt | tail -2
footer_check bench/r11_sf01_oracle_full.txt /tmp/verify_r11_final

echo "== 3/5 sf1 oracle gate =="
rm -rf /tmp/verify_r11_sf1
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.Verify data/sf1 /tmp/verify_r11_sf1" > /tmp/r11_verify_sf1.log 2>&1
python3 tools/check_oracle.py data/sf1 /tmp/verify_r11_sf1 | tee bench/r11_sf1_oracle_full.txt | tail -2
footer_check bench/r11_sf1_oracle_full.txt /tmp/verify_r11_sf1

bench_run() { # sfdir tag
  SPARK_GRAFT_SF_DIR="$1" sbt -batch "runMain graft.Bench" > "/tmp/r11_bench_$2.log" 2>&1
  cp bench/last_bench.json "bench/r11_$2.json"
  grep -o 'runs {"runs":.*' "/tmp/r11_bench_$2.log" | tail -1 | sed 's/^runs //' > "bench/r11_$2_runs.json"
  python3 - "$2" <<'EOF'
import json, sys
tag = sys.argv[1]
d = json.load(open(f"bench/r11_{tag}.json"))
r = json.load(open(f"bench/r11_{tag}_runs.json"))
assert d.get("queries") and d.get("value") is not None, f"bench/r11_{tag}.json incomplete"
assert r.get("runs"), f"bench/r11_{tag}_runs.json incomplete"
print(f"{tag} total", d["value"], len(d["queries"]), "cells,", len(r["runs"]), "runs rows")
EOF
}

echo "== 4/5 bench sf0.1 =="
bench_run /root/testdata/sf0.1 sf0.1

echo "== 5/5 bench sf1 =="
bench_run data/sf1 sf1

echo "== ALL GATES DONE + ARTIFACTS VERIFIED at $(git rev-parse HEAD) =="
echo "next (and ONLY) step: commit bench/r11_* artifacts + STATUS.md"
