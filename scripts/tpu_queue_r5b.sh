#!/bin/bash
# Round-5 follow-up TPU queue: runs AFTER tpu_queue_r5.sh completes
# (pass that queue's PID as $1; we wait for it — ONE TPU client at a time).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs

if [ -n "$1" ]; then
  echo "waiting for queue pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

echo "== seeded campaign_ml re-run (grid-seeded refiner) =="
timeout 10800 python scripts/run_all.py --fit-ml \
  --equations GradDependentNonlinear --dims 20 40 60 80 \
  --variants full_history --harness RepeatedExperiment \
  --save-path reports/campaign_ml >results/logs/campaign_ml_r5.log 2>&1
sleep 20

echo "== d=250 stretch re-run (semigroup Allen-Cahn leg) =="
timeout 5400 python scripts/stretch_d250.py --tpu \
  >results/logs/stretch_d250_r5.log 2>&1
echo "== queue b done =="
