import numpy as np, jax, jax.numpy as jnp
from hessgpu_tpu.config import SiftConfig
from hessgpu_tpu.io_image import load_image
from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
from hessgpu_tpu.parallel.batch import _batched_pipeline
from hessgpu_tpu.pyramid import _CfgKey, make_plan
from hessgpu_tpu.utils.timing import device_stage_breakdown

B = 16
img = load_image("/root/reference/data/640-1.jpg")
g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
h, w = g.shape
cfg = SiftConfig(); plan = make_plan(h, w, cfg); ckey = _CfgKey(cfg)
batch = jax.device_put(jnp.asarray(np.stack([g]*B)), jax.devices()[0])

fn = jax.jit(lambda b: _batched_pipeline(b, plan, ckey))
bk = device_stage_breakdown(fn, batch, runs=5)
for k, v in bk.items():
    print(f"{k:24s} {v/B:8.3f} ms/frame   ({v:7.3f} ms/batch)")
