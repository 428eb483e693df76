#!/bin/bash
# Round-5 TPU queue: serial (one TPU owner at a time).
# 1. bench matrix r05 — the four scan rows VERDICT r4 flagged first (lean
#    lane routing now active under scan_blocks), then the unrolled rows.
# 2. 512^2 host feed-rate probe (E2E_TRAIN_r05.json, VERDICT item 4).
# 3. 500-step rollout artifact (VERDICT item 9): quick-train avit_small on
#    a 512^2 synthetic trajectory, then one 100-window in-scan-metrics
#    rollout.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== matrix: scan rows $(date)"
timeout 14000 python -u scripts/bench_matrix.py --out BENCH_MATRIX_r05.json --timeout 3300 \
  --only film_avit_small_512_b8_scan film_avit_small_1024_b2_scan avit_big_512_b4_scan wide_flowboiling_2048x512_b2_scan
echo "=== matrix: unrolled rows $(date)"
timeout 12000 python -u scripts/bench_matrix.py --out BENCH_MATRIX_r05.json --timeout 3300 \
  --only headline_film_avit_small_512_b4 film_avit_small_512_b2 avit_big_512_b2 wide_flowboiling_2048x512_b1
echo "=== e2e probe 512 $(date)"
timeout 3600 python -u scripts/probe_e2e_train.py --size 512 --batch 4 --out E2E_TRAIN_r05.json || true
echo "=== rollout ckpt train $(date)"
BUBBLEML_SAMPLES=/tmp/samples512 timeout 4000 python -u scripts/train.py \
  data_cfg=samples_smoke model_cfg=avit_small optim_cfg=adamw max_epochs=1 \
  batch_size=1 limit_train_batches=3 limit_val_batches=1 \
  log_dir=/tmp/roll512_logs use_wandb=false || true
echo "=== rollout 500 steps $(date)"
CKPT=$(ls -d /tmp/roll512_logs/*/last 2>/dev/null | head -1)
timeout 6000 python -u scripts/inference.py --ckpt "$CKPT" \
  --data /tmp/samples512/sample_1.hdf5 --model-cfg avit_small \
  --data-cfg samples_smoke --steps 500 --start-time 5 \
  --save-dir /tmp/roll512 --in-scan-metrics || true
echo "=== post-change scanned profile $(date)"
timeout 2400 python -u scripts/profile_step.py --scanned --trace-steps 5 --top 60 \
  --out /tmp/profile_scanned_r05_post > /tmp/profile_post.log 2>&1 || true
echo "=== done $(date)"
