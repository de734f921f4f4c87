#!/bin/bash
# Round-5 queue f: d=250 stretch re-run with the rbf-pinned repair leg.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p results/logs
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "== d250 stretch (rbf repair leg) =="
timeout 5400 python scripts/stretch_d250.py --tpu \
  >results/logs/stretch_d250_r5b.log 2>&1
echo "== queue f done =="
