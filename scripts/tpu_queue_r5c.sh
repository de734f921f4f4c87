#!/bin/bash
# Round-5 third TPU queue: HJB full-history campaign with the round-5
# mixture surrogate default (the earlier full-history rows ran the rbf
# backend mid-transition; those are preserved in reports/campaign_hjb_rbf
# as the coarse-surrogate auto-schedule demonstration).  Waits on $1.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "== HJB full-history campaign (mixture surrogate) =="
timeout 10800 python scripts/run_all.py --equations HJB \
  --dims 20 100 --variants full_history \
  --harnesses RepeatedExperiment SimpleUniform InferenceScaling \
              SimpleScaling ComputingBudget ConvergenceRate \
  --save-path reports/campaign >results/logs/campaign_hjb_fh_mixture.log 2>&1
echo "== queue c done =="
