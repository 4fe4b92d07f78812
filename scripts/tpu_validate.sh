#!/bin/bash
# End-of-round TPU compile/run gate (VERDICT round-4 task 2).
#
# Interpret-mode tests cannot see Mosaic's VMEM-stack behavior - only the
# real compiler can (round 4 shipped a bench that failed TPU compilation
# while every CPU test was green). This script compiles AND runs every
# benchmark shape in fresh processes and fails loudly if any of them
# breaks. HARD RULE: no end-of-round commit without this green; commit
# its output (docs/evidence/tpu_gate.txt) alongside.
#
# Usage:  bash scripts/tpu_validate.sh          # gate only (~10 min)
#         bash scripts/tpu_validate.sh pack     # + evidence_pack refresh
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/evidence
out=docs/evidence/tpu_gate.txt
: > "$out"
fail=0

note() { echo "$@" | tee -a "$out"; }

note "== TPU gate @ $(git rev-parse --short HEAD) $(date -u +%FT%TZ) =="

# 1. headline bench: 640x480 B=16, hessian AND dog personalities.
#    Must emit the JSON line with a numeric value.
note "--- 1. bench.py (640x480 B=16, hessian+dog)"
line=$(timeout 2400 python bench.py 2>>"$out" | tail -1)
note "$line"
python - "$line" <<'EOF' || fail=1
import json, sys
d = json.loads(sys.argv[1])
assert isinstance(d.get("value"), (int, float)) and d["value"] > 0, d
assert d.get("features_per_frame") == 230, d   # parity pin (640-1.jpg)
assert d.get("dog_fps", 0) > 0, d
EOF

# 2. large shapes: 1024x768 and 2048x1536 single-image (compile + run).
note "--- 2. bench_large.py (1024x768, 2048x1536)"
line=$(timeout 2400 python bench_large.py 2>>"$out" | tail -1)
note "$line"
python - "$line" <<'EOF' || fail=1
import json, sys
d = json.loads(sys.argv[1])
assert d.get("value", 0) > 0, d            # 1024x768 fps
assert d.get("fps_2048x1536", 0) > 0, d
EOF

# 3. batched secondary workload (B sweep exercises other conv blockings)
note "--- 3. bench_batch.py"
line=$(timeout 2400 python bench_batch.py 2>>"$out" | tail -1)
note "$line"
[ -n "$line" ] || fail=1

if [ "${1:-}" = "pack" ]; then
    note "--- 4. evidence pack refresh"
    bash scripts/evidence_pack.sh bench large match stages 2>&1 | tee -a "$out"
fi

if [ "$fail" = 0 ]; then
    note "== GATE PASS =="
else
    note "== GATE FAIL =="
fi
exit $fail
