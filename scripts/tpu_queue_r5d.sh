#!/bin/bash
# Round-5 final TPU queue: mfu re-run (vpu gate fix) + final bench.
# Waits on $1 (queue c).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "== mfu (vpu witness gate) =="
timeout 3600 python scripts/mfu.py >results/logs/mfu_r5.log 2>&1
sleep 20
echo "== bench final =="
timeout 1800 python bench.py --round 5 >results/logs/bench_r5_final.out \
  2>results/logs/bench_r5_final.err
echo "== queue d done =="
