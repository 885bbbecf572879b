#!/usr/bin/env bash
# ScaleVerify: the driver's correctness gate at TWO extra scale factors.
#
# The driver only checks sf0.01; a comparison that is scale-factor-
# fragile (e.g. the DuckDB double->DECIMAL cast corner that flipped one
# embed_knn_batch cosine at sf0.001, PERF.md "Known corner") passes the
# gate and stays latent. This script runs the SAME dump-and-compare
# (graft.Verify + scripts/check.py, the local replica of the driver's
# DuckDB gate) at sf0.001 and at a 10x synthesis of sf0.01, so
# scale-fragility surfaces locally first.
#
# Usage: scripts/scale_verify.sh            # both factors
#        scripts/scale_verify.sh small      # sf0.001 only
#        scripts/scale_verify.sh big        # 10x synth only
set -euo pipefail
cd "$(dirname "$0")/.."
which=${1:-both}
SYNTH=${SYNTH_DIR:-/tmp/sfsynth_v10x}

run_gate() {
  local dir=$1 out=$2
  echo "== Verify over $dir =="
  sbt -batch "runMain graft.Verify $dir $out"
  echo "== DuckDB compare over $dir =="
  python3 scripts/check.py "$dir" "$out"
}

if [[ $which == small || $which == both ]]; then
  run_gate /root/testdata/sf0.001 /tmp/scale_verify_sf0.001
fi

if [[ $which == big || $which == both ]]; then
  if [[ ! -d $SYNTH/lineitem.parquet ]]; then
    echo "== Synthesizing 10x of sf0.01 at $SYNTH =="
    sbt -batch "runMain graft.tools.SynthScale /root/testdata/sf0.01 $SYNTH 10"
  fi
  run_gate "$SYNTH" /tmp/scale_verify_10x
fi
echo "ScaleVerify: all green"
