#!/bin/bash
# Round-3 sequential TPU job queue. The relay supports ONE client at a time
# (CLAUDE.md), so the remaining VERDICT round-2 artifacts run back-to-back:
#   1. convergence_parity.json  (VERDICT #6)
#   2. quadrature_parity.json   (VERDICT #7)
#   3. d250 rerun with the variance guard (VERDICT #5 acceptance)
#   4. SineNonlinear d=20 campaign rows (new family, report evidence)
# Usage: nohup bash scripts/round3_queue.sh [pid-to-wait-for] > /tmp/queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ $# -ge 1 ]; then
  echo "[queue] waiting for pid $1 to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi

run() {
  local name=$1; shift
  echo "[queue] ==== $name: $* ===="
  local t0=$SECONDS
  timeout 3600 "$@"
  local rc=$?
  echo "[queue] ==== $name done rc=$rc in $((SECONDS-t0))s ===="
}

run convergence_parity python scripts/convergence_parity.py
run quadrature_parity  python scripts/quadrature_parity.py --frozen-seeds 5
run d250_guarded       python scripts/stretch_d250.py --tpu
run sine_d20_fh python -m scasml_gp_tpu.harness.runner \
    --equation SineNonlinear --dim 20 --variant full_history \
    --harness RepeatedExperiment --save-path reports/sine
run sine_d20_quad python -m scasml_gp_tpu.harness.runner \
    --equation SineNonlinear --dim 20 --variant quadrature \
    --harness RepeatedExperiment --save-path reports/sine
echo "[queue] ALL DONE"
