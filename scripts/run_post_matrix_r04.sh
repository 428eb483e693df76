#!/bin/bash
# Round-4 measurement sequence after the bench matrix frees the TPU.
# One TPU owner at a time; serial. Results land in /tmp/post_matrix_r04/.
set -u
cd /root/repo
OUT=/tmp/post_matrix_r04
mkdir -p $OUT

echo "=== headline re-run (loss nchw) $(date)"
timeout 3000 python -u bench.py --batch 4 --size 512 > $OUT/bench_nchw.json 2> $OUT/bench_nchw.log
echo "=== headline loss-layout A/B (nhwc) $(date)"
timeout 3000 python -u bench.py --batch 4 --size 512 --loss-layout nhwc > $OUT/bench_nhwc.json 2> $OUT/bench_nhwc.log
echo "=== axial lane stack fwd-only $(date)"
timeout 3000 python -u scripts/ablate_block.py --variants axial --attn-impl lane --fwd-only > $OUT/ablate_lane_fwd.json 2> $OUT/ablate_lane_fwd.log
echo "=== axial lane stack fwd+bwd $(date)"
timeout 3000 python -u scripts/ablate_block.py --variants axial --attn-impl lane > $OUT/ablate_lane_fwdbwd.json 2> $OUT/ablate_lane_fwdbwd.log
echo "=== per-op profile $(date)"
timeout 3600 python -u scripts/profile_step.py --batch 4 --size 512 --top 60 > $OUT/profile.txt 2> $OUT/profile.log
echo "=== e2e sustained train probe $(date)"
timeout 3600 python -u scripts/probe_e2e_train.py --out E2E_TRAIN_r04.json > $OUT/e2e.json 2> $OUT/e2e.log
echo "=== done $(date)"
