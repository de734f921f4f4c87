#!/bin/bash
# Round-4 sequential TPU measurement queue (ONE TPU client at a time —
# CLAUDE.md relay rule).  Each step is wrapped in `timeout` so a wedged
# relay burns bounded time; bench.py carries its own hang watchdog.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs

echo "== bench cold =="
timeout 1800 python bench.py >results/logs/bench_cold.out 2>results/logs/bench_cold.err
sleep 20
echo "== bench warm =="
timeout 1200 python bench.py >results/logs/bench_warm.out 2>results/logs/bench_warm.err
sleep 20
echo "== vpu probe =="
timeout 1800 python scripts/vpu_probe.py >results/logs/vpu_probe.log 2>&1
sleep 20
echo "== mfu =="
timeout 3600 python scripts/mfu.py >results/logs/mfu.log 2>&1
sleep 20
echo "== bench final (picks up fresh mfu rows) =="
timeout 1200 python bench.py >results/logs/bench_final.out 2>results/logs/bench_final.err
sleep 20
echo "== quadrature parity (combined faithful, 30 reps) =="
timeout 5400 python scripts/quadrature_parity.py --reps 30 \
  >results/logs/quadparity.log 2>&1
sleep 20
echo "== convergence parity (+ small-N default sweep) =="
timeout 5400 python scripts/convergence_parity.py \
  >results/logs/convparity.log 2>&1
echo "== queue done =="
