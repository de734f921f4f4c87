#!/bin/bash
# Round-5 queue e: campaign_ml re-run with the double-split anchored
# selection (gp/marginal.py round-5 guard).  Waits on $1 (queue d).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "== campaign_ml (double-split anchored selection) =="
timeout 10800 python scripts/run_all.py --fit-ml \
  --equations GradDependentNonlinear --dims 20 40 60 80 \
  --variants full_history --harness RepeatedExperiment \
  --save-path reports/campaign_ml >results/logs/campaign_ml_r5b.log 2>&1
echo "== queue e done =="
