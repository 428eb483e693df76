#!/bin/bash
# Round-5 follow-up TPU probes: waits for the main queue (pid in
# /tmp/queue.pid) to release the chip, then measures the pyramid stage
# formulations (the r05 profile's #1 subsystem) fwd+bwd at the flagship
# embed shape.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

QPID=$(cat /tmp/queue.pid)
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "=== main queue done, starting probes $(date)"

echo "=== probe_pyramid fwd+bwd $(date)"
timeout 3000 python -u scripts/probe_pyramid.py --steps 30 --out /tmp/probe_pyramid.json
echo "=== done $(date)"
