#!/usr/bin/env bash
# BenchCheck: the perf-regression gate, run at every round close (the
# analog of scale_verify.sh for BENCH).
#
# The committed BENCH_LOCAL.json is the per-query idle profile this HEAD
# is known to deliver (median-of-3, idle host — PERF.md "Measurement
# protocol"). This script re-runs the bench and FAILS if
#   - any query exceeds 2x its committed median (ignoring sub-150 ms
#     entries, which are scheduling noise), or
#   - the total exceeds 1.3x the committed total (the PERF.md threshold
#     for "this run was contended — re-run before trusting it").
# On failure the committed profile is restored so a contaminated run
# can't silently become the new reference.
#
# Usage: scripts/bench_check.sh        # sf0.1, local[32]
set -euo pipefail
cd "$(dirname "$0")/.."

REF=BENCH_LOCAL.json
[[ -f $REF ]] || { echo "no committed $REF to compare against"; exit 1; }
cp "$REF" /tmp/bench_check_ref.json

echo "== Bench run (sf0.1) =="
if ! SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch 'runMain graft.Bench' > /tmp/bench_check.log 2>&1; then
  tail -20 /tmp/bench_check.log
  cp /tmp/bench_check_ref.json "$REF"
  exit 1
fi

# Bench only records a profile from the reference config (local[32],
# median-of-3, default sf + partitions). If it refused to write, the
# compare below would diff the committed file against itself and pass
# vacuously — fail loudly instead.
if cmp -s /tmp/bench_check_ref.json "$REF"; then
  echo "FAIL: Bench did not record a new profile (off-reference config?" \
       "check SPARK_GRAFT_CPUS/REPS/SF_DIR/INITIAL_PARTITIONS — or the" \
       "host was loaded at start: Bench refuses to refresh above" \
       "SPARK_GRAFT_MAX_LOAD, see its stderr note) — nothing was gated"
  grep -h "NOT refreshing" /tmp/bench_check.log || true
  exit 1
fi

python3 - <<'EOF' || { cp /tmp/bench_check_ref.json BENCH_LOCAL.json; exit 1; }
import json, sys
ref = json.load(open('/tmp/bench_check_ref.json'))
new = json.load(open('BENCH_LOCAL.json'))
bad = []
for q, t in new['queries'].items():
    r = ref['queries'].get(q)
    if r is not None and r >= 0.15 and t > 2.0 * r:
        bad.append((q, r, t))
tr, tn = ref['value'], new['value']
print(f"total: committed {tr:.1f}s -> measured {tn:.1f}s ({tn/tr:.2f}x), "
      f"{len(new['queries'])} queries")
for q, r, t in sorted(bad, key=lambda x: -x[2] / x[1]):
    print(f"REGRESSION {q}: {r:.3f}s -> {t:.3f}s ({t/r:.1f}x)")
ok = True
if tn > 1.3 * tr:
    print("FAIL: total > 1.3x committed — contended run or real drift; "
          "re-run idle before trusting either way")
    ok = False
if bad:
    print(f"FAIL: {len(bad)} queries above 2x their committed median")
    ok = False
if not ok:
    sys.exit(1)
print("OK: within the 2x per-query / 1.3x total envelope")
EOF
echo "BENCH_LOCAL.json refreshed from this run"
