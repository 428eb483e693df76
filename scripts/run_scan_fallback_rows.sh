#!/bin/bash
# Scan-config fallback rows: the fused_block/lane scan programs at these
# shapes either HBM-OOM (lane dual saved dots) or OOM the relay's compile
# helper (fused_block: SIGKILL'd host-side). XLA 'plain' compiles light and
# its batch-dim attention dots are not saved under the dots remat policy —
# a recorded number with named routing beats an error row.
set -u
cd /root/repo
OUT=/tmp/scan_fallback
mkdir -p $OUT
run() {
  label=$1; shift
  echo "=== $label $(date)"
  timeout 2700 python -u bench.py --steps 10 --per-call-only --attn-impl plain "$@" \
    > $OUT/$label.json 2> $OUT/$label.log
  echo "rc=$? $(tail -c 200 $OUT/$label.json)"
}
run avit_big_512_b4_scan --batch 4 --size 512 --model-cfg avit_big --scan-blocks
run film_avit_small_1024_b2_scan --batch 2 --size 1024 --scan-blocks
run wide_flowboiling_2048x512_b2_scan --batch 2 --height 512 --width 2048 --scan-blocks
echo "=== done $(date)"
