#!/bin/bash
# Round-5 queue g: flagless GradDependent campaign + campaign_ml refresh
# with the two-split grid tuner (gp/tuning.py round-5 stability fix).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs
echo "== GradDependent campaign (two-split tuner) =="
timeout 10800 python scripts/run_all.py \
  --equations GradDependentNonlinear --dims 20 40 60 80 100 \
  --variants quadrature full_history --harness RepeatedExperiment \
  --save-path reports/campaign >results/logs/campaign_gd_r5.log 2>&1
sleep 20
echo "== campaign_ml (two-split everywhere) =="
timeout 10800 python scripts/run_all.py --fit-ml \
  --equations GradDependentNonlinear --dims 20 40 60 80 \
  --variants full_history --harness RepeatedExperiment \
  --save-path reports/campaign_ml >results/logs/campaign_ml_r5c.log 2>&1
echo "== queue g done =="
