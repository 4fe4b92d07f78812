#!/bin/bash
# One-shot validation of TPU-gated changes after a tunnel outage.
# Run when `python -c "import jax; jax.devices()"` comes back. Each
# distinct jit compile costs minutes under remote compile - this list is
# deliberately short, ordered most-important-first.
set -x
cd /root/repo

echo "=== 1. headline bench (canvas-direct writes + u16 sorts + margin fix)"
timeout 2400 python bench.py 2>&1 | tail -1

echo "=== 2. TPU vs CPU feature parity (canvas path correctness on device)"
timeout 2400 python - <<'EOF' 2>&1 | tail -5
import numpy as np, jax, jax.numpy as jnp
from hessgpu_tpu.config import SiftConfig
from hessgpu_tpu.io_image import load_image
from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
from hessgpu_tpu.parallel.batch import _batched_pipeline
from hessgpu_tpu.pyramid import _CfgKey, make_plan
img = load_image("/root/reference/data/640-1.jpg")
g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
cfg = SiftConfig(); plan = make_plan(*g.shape, cfg); ck = _CfgKey(cfg)
t = _batched_pipeline(jnp.asarray(g[None]), plan, ck)
n = int(np.asarray(t.count())[0])
print("TPU features:", n, "(CPU float32 reference: 230)")
d = np.asarray(t.desc[0])[np.asarray(t.valid[0])]
print("descs finite:", np.isfinite(d).all(), "norm med:", np.median(np.linalg.norm(d,axis=1)))
EOF

echo "=== 3. per-stage device profile B=16"
timeout 2400 python scripts/stage_b16.py 2>&1 | tail -10

echo "=== 4. MXU descriptor contraction experiment (flip mxu=True and time)"
echo "    (manual: ops/pallas/patch.py descriptor_pallas(mxu=...); compare stage 3)"

echo "=== 5. batched secondary workload"
timeout 2400 python bench_batch.py 2>&1 | tail -1
