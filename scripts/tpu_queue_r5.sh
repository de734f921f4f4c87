#!/bin/bash
# Round-5 sequential TPU measurement queue (ONE TPU client at a time —
# CLAUDE.md relay rule).  Each step wrapped in `timeout` so a wedged relay
# burns bounded time.  Order: cheap attribution probes first, then the
# campaign refreshes the round-5 code changes invalidate (AllenCahn
# semigroup surrogate, HJB schedule auto-selection), then large-N matrix
# completion, then the roofline/bench refresh.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs

echo "== rollout attribution (+ bf16 path) =="
timeout 2400 python scripts/rollout_attribution.py \
  >results/logs/rollout_attr.log 2>&1
sleep 20

echo "== ml tuner diagnosis d=40,60 =="
timeout 4800 python scripts/ml_tuner_diagnosis.py --dims 40 60 \
  >results/logs/ml_diag.log 2>&1
sleep 20

echo "== campaign refresh: AllenCahn (semigroup surrogate) =="
timeout 7200 python scripts/run_all.py --equations AllenCahn \
  --dims 20 100 --variants full_history \
  --harnesses SimpleUniform RepeatedExperiment ConvergenceRate \
              InferenceScaling SimpleScaling ComputingBudget \
  --save-path reports/campaign >results/logs/campaign_ac_fh.log 2>&1
timeout 2400 python scripts/run_all.py --equations AllenCahn \
  --dims 20 100 --variants quadrature --harness RepeatedExperiment \
  --save-path reports/campaign >results/logs/campaign_ac_quad.log 2>&1
sleep 20

echo "== campaign refresh: HJB (schedule auto-selection) =="
timeout 10800 python scripts/run_all.py --equations HJB \
  --dims 20 100 --variants full_history \
  --harnesses SimpleUniform RepeatedExperiment ConvergenceRate \
              InferenceScaling SimpleScaling ComputingBudget \
  --save-path reports/campaign >results/logs/campaign_hjb_fh.log 2>&1
timeout 3600 python scripts/run_all.py --equations HJB \
  --dims 20 100 --variants quadrature --harness RepeatedExperiment \
  --save-path reports/campaign >results/logs/campaign_hjb_quad.log 2>&1
sleep 20

echo "== large-N matrix completion: quadrature rows + d=20 =="
timeout 10800 python scripts/run_all.py --equations GradDependentNonlinear \
  --num-domain 8192 --num-boundary 512 \
  --dims 40 60 80 100 --variants quadrature --harness RepeatedExperiment \
  --save-path reports/campaign_largeN \
  >results/logs/largeN_quad.log 2>&1
timeout 5400 python scripts/run_all.py --equations GradDependentNonlinear \
  --num-domain 8192 --num-boundary 512 \
  --dims 20 --variants quadrature full_history --harness RepeatedExperiment \
  --save-path reports/campaign_largeN \
  >results/logs/largeN_d20.log 2>&1
sleep 20

echo "== mfu refresh (raw fracs + current code) =="
timeout 3600 python scripts/mfu.py >results/logs/mfu.log 2>&1
sleep 20

echo "== bench (k=5 median/iqr) =="
timeout 1800 python bench.py --round 5 >results/logs/bench_r5.out \
  2>results/logs/bench_r5.err
echo "== queue done =="
