#!/bin/bash
# Round-5 queue h: final flagless campaign with the ScaSML-judge tuner.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs
echo "== GradDependent campaign (scasml-judge tuner) =="
timeout 10800 python scripts/run_all.py \
  --equations GradDependentNonlinear --dims 20 40 60 80 100 \
  --variants quadrature full_history --harness RepeatedExperiment \
  --save-path reports/campaign >results/logs/campaign_gd_r5b.log 2>&1
sleep 20
echo "== SineNonlinear refresh (scasml-judge tuner) =="
timeout 7200 python scripts/run_all.py \
  --equations SineNonlinear --dims 20 100 \
  --variants quadrature full_history --harness RepeatedExperiment \
  --save-path reports/campaign >results/logs/campaign_sine_r5.log 2>&1
sleep 20
echo "== campaign_ml (scasml-judge selection) =="
timeout 10800 python scripts/run_all.py --fit-ml \
  --equations GradDependentNonlinear --dims 20 40 60 80 \
  --variants full_history --harness RepeatedExperiment \
  --save-path reports/campaign_ml >results/logs/campaign_ml_r5d.log 2>&1
sleep 20
echo "== large-N refresh (scasml-judge tuner), both variants d=40..100 =="
timeout 10800 python scripts/run_all.py --equations GradDependentNonlinear \
  --num-domain 8192 --num-boundary 512 \
  --dims 40 60 80 100 --variants quadrature full_history \
  --harness RepeatedExperiment --save-path reports/campaign_largeN \
  >results/logs/largeN_r5b.log 2>&1
echo "== queue h done =="
