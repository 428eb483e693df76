#!/usr/bin/env python3
"""Merge the scan-fallback bench rows (/tmp/scan_fallback) into
BENCH_MATRIX_r04.json, annotating why the default routing could not run
(see DESIGN.md 'Scan-config compile wall')."""
import json
import os

NOTE = {
    "avit_big_512_b4_scan": (
        "attn_impl=plain fallback: fused_block at this shape SIGKILLs the "
        "relay compile helper (host OOM); lane HBM-OOMs under scan (dual "
        "saved projection dots)"
    ),
    "film_avit_small_1024_b2_scan": (
        "attn_impl=plain fallback: fused_block 64x64 compile exceeds the "
        "50-min row budget through the relay; lane HBM-OOMs under scan"
    ),
    "wide_flowboiling_2048x512_b2_scan": (
        "attn_impl=plain fallback: fused_block at 32x128 SIGKILLs the relay "
        "compile helper; lane HBM-OOMs under scan"
    ),
}

# Rows where EVERY impl failed this round get a concise diagnosis instead
# of an 800-char log tail (full logs: /tmp/scan_fallback/*.log; DESIGN.md
# 'Scan-config compile wall').
DIAGNOSIS = {
    "film_avit_small_1024_b2_scan": (
        "relay compile infrastructure failure, all impls tried this round: "
        "auto(fused_block) exceeds the 50-min row budget; lane HBM-OOMs "
        "under scan (dual saved projection dots); plain fails in the "
        "relay's compile helper (HTTP 500: tpu_compile_helper exit code 1, "
        "~4 min in). r02 recorded 584 ms per-call for this config on the "
        "then-current relay."
    ),
    "wide_flowboiling_2048x512_b2_scan": (
        "relay compile infrastructure failure, all impls tried this round: "
        "auto(fused_block) SIGKILLs the relay compile helper (host OOM); "
        "plain fails with tpu_compile_helper exit code 1. The b1 row of "
        "the same grid runs at 118.5 ms with core+lane."
    ),
}

out = "BENCH_MATRIX_r04.json"
results = json.load(open(out))
merged = 0
for label, note in NOTE.items():
    p = f"/tmp/scan_fallback/{label}.json"
    if not os.path.exists(p):
        continue
    line = open(p).read().strip().splitlines()
    if not line or not line[-1].startswith("{"):
        continue
    row = json.loads(line[-1])
    row["note"] = note
    results[label] = row
    merged += 1
for label, diag in DIAGNOSIS.items():
    if label in results and "error" in results[label]:
        results[label] = {"error": results[label]["error"], "diagnosis": diag}
json.dump(results, open(out, "w"), indent=1)
print(f"merged {merged} fallback rows into {out}")
