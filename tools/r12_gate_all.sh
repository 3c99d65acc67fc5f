#!/usr/bin/env bash
# Round-12 end-of-round evidence, all at ONE HEAD, ATOMIC (the r4-r8
# verdicts' "land-after-the-gate" fix, with hard artifact checks):
# full suite -> sf0.01 oracle gate -> sf1 oracle gate -> sf1 FULL-
# INVENTORY timing sweep (NEW, r11 verdict #1: every query timed once,
# budget-checked — the stage that would have caught d04 at 106 s nine
# rounds earlier) -> d09 proportionality audit (r11 verdict #2) ->
# timed bench at sf0.1 and sf1, artifacts under bench/.
#
# Rules (r8 verdict item 3):
#  - the ONLY commit after this script completes is the artifact commit;
#  - any further operator work re-runs the script;
#  - a truncated artifact must never be committed: every oracle gate
#    asserts its footer reads "== N pass, 0 fail ==" with N equal to
#    the oracle count the Verify dump declared, the sweep must cover
#    every oracle query and pass its per-cell budget, and both bench
#    JSONs must parse with their runs files present — the script EXITS
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

echo "== 1/7 full suite =="
sbt -batch test 2>&1 | grep -E "Tests:|All tests|FAILED"

echo "== 2/7 sf0.01 oracle gate =="
rm -rf /tmp/verify_r12_final
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r12_final" > /tmp/r12_verify01.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r12_final | tee bench/r12_sf01_oracle_full.txt | tail -2
footer_check bench/r12_sf01_oracle_full.txt /tmp/verify_r12_final

echo "== 3/7 sf1 oracle gate =="
rm -rf /tmp/verify_r12_sf1
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.Verify data/sf1 /tmp/verify_r12_sf1" > /tmp/r12_verify_sf1.log 2>&1
python3 tools/check_oracle.py data/sf1 /tmp/verify_r12_sf1 | tee bench/r12_sf1_oracle_full.txt | tail -2
footer_check bench/r12_sf1_oracle_full.txt /tmp/verify_r12_sf1

echo "== 4/7 sf1 full-inventory timing sweep =="
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.Sweep data/sf1 bench/r12_sf1_sweep.json" > /tmp/r12_sweep.log 2>&1 || { tail -5 /tmp/r12_sweep.log; exit 1; }
python3 - <<'EOF'
import json
BUDGET = 15.0
# cells allowed over budget, each with its committed audit note
AUDITED = {
  # d06: label-only-blocked exact near-dup — the DESIGNED-quadratic
  # exactness reference for d10 (SparkEntry.scala benchQueries comment);
  # demoted from the timed bench set by design, r9-r11 verdicts concur.
  "d06_embedding_neardup": 60.0,
}
sweep = json.load(open("bench/r12_sf1_sweep.json"))
oracle = json.load(open("/tmp/verify_r12_sf1/oracle_sql.json"))
missing = set(oracle) - set(sweep["queries"])
assert not missing, f"sweep missed {len(missing)} queries: {sorted(missing)[:5]}"
over = {q: t for q, t in sweep["queries"].items() if t > AUDITED.get(q, BUDGET)}
assert not over, f"cells over budget without an audit note: {over}"
tot = sum(sweep["queries"].values())
worst = sorted(sweep["queries"].items(), key=lambda kv: -kv[1])[:8]
print(f"sweep OK: {sweep['n_queries']} queries, total {tot:.1f}s, worst: " +
      ", ".join(f"{q}={t:.1f}s" for q, t in worst))
EOF

echo "== 5/7 d09 proportionality audit =="
sbt -batch "runMain graft.D09Audit /root/testdata/sf0.1 /tmp/d09_sf0.1.json" > /tmp/r12_d09a.log 2>&1
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.D09Audit data/sf1 /tmp/d09_sf1.json" > /tmp/r12_d09b.log 2>&1
python3 - <<'EOF'
import json
a = json.load(open("/tmp/d09_sf0.1.json"))
b = json.load(open("/tmp/d09_sf1.json"))
json.dump({"sf0.1": a, "sf1": b,
           "true_pair_growth": round(b["true_pairs"] / max(1, a["true_pairs"]), 1),
           "note": "output-proportional iff true_pair_growth >= the cell's "
                   "sf0.1->sf1 runtime ratio (DedupOps.scala d09 comment)"},
          open("bench/r12_d09_proportionality.json", "w"), indent=1)
g = b["true_pairs"] / max(1, a["true_pairs"])
print(f"d09 audit: true pairs {a['true_pairs']} -> {b['true_pairs']} ({g:.1f}x on 10x docs), "
      f"collisions/true {b['collisions_per_true_pair']}")
EOF

bench_run() { # sfdir tag
  SPARK_GRAFT_SF_DIR="$1" sbt -batch "runMain graft.Bench" > "/tmp/r12_bench_$2.log" 2>&1
  cp bench/last_bench.json "bench/r12_$2.json"
  grep -o 'runs {"runs":.*' "/tmp/r12_bench_$2.log" | tail -1 | sed 's/^runs //' > "bench/r12_$2_runs.json"
  python3 - "$2" <<'EOF'
import json, sys
tag = sys.argv[1]
d = json.load(open(f"bench/r12_{tag}.json"))
r = json.load(open(f"bench/r12_{tag}_runs.json"))
assert d.get("queries") and d.get("value") is not None, f"bench/r12_{tag}.json incomplete"
assert r.get("runs"), f"bench/r12_{tag}_runs.json incomplete"
print(f"{tag} total", d["value"], len(d["queries"]), "cells,", len(r["runs"]), "runs rows")
EOF
}

echo "== 6/7 bench sf0.1 =="
bench_run /root/testdata/sf0.1 sf0.1

echo "== 7/7 bench sf1 =="
bench_run data/sf1 sf1

echo "== ALL GATES DONE + ARTIFACTS VERIFIED at $(git rev-parse HEAD) =="
echo "next (and ONLY) step: commit bench/r12_* artifacts + STATUS.md"
