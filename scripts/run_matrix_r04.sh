#!/bin/bash
# Round-4 proving run: v6/core numerics artifact + full bench matrix.
# One TPU owner at a time; serial.
set -u
cd /root/repo
echo "=== check_lane_v6 $(date)"
OUT=$(timeout 3600 python -u scripts/check_lane_v6.py 2>&1)
RC=$?
python - "$RC" <<'EOF' "$OUT"
import json, sys
rc = int(sys.argv[1]); out = sys.argv[2]
json.dump({"ok": rc == 0, "rc": rc, "script": "scripts/check_lane_v6.py",
           "date": "2026-08-20", "output": out.splitlines()},
          open("LANE_V6_CHECK_r04.json", "w"), indent=1)
EOF
echo "=== bench_matrix $(date)"
timeout 21000 python -u scripts/bench_matrix.py --out BENCH_MATRIX_r04.json --timeout 3000
echo "=== done $(date)"
