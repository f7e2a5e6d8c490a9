"""Pretrain-path throughput probe (VERDICT r3 #9): steps/s of the jitted
pretrain step at the reference budget shape — batch 16 x 8 frames at 150x200
model resolution with GMFlow computed ON-THE-FLY inside the step
(`config/pretrain.yaml`, `flowmap/model_wrapper_pretrain.py:46-58`).

Random GMFlow weights (checkpoints unreachable offline) run the identical
compute graph. Prints one JSON line for BASELINE.md.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.flow.common import compute_bidirectional_flow
from flowmap_tpu.flow.gmflow import GMFlowPredictor
from flowmap_tpu.flow.predictors import FlowPredictorGMFlowCfg
from flowmap_tpu.loss import LossFlowCfg
from flowmap_tpu.model import (
    BackboneMidasCfg,
    IntrinsicsSoftminCfg,
    ExtrinsicsProcrustesCfg,
    ModelCfg,
)
from flowmap_tpu.training.pretrain import (
    PretrainTrainerCfg,
    init_pretrain_state,
    make_pretrain_step,
)
from flowmap_tpu.types import Batch

B, F = 16, 8
H, W = 128, 192  # reference targets 150x200, then patch-crops to /32
# multiples (flowmap/misc/cropping.py:36-37) -> the model actually sees 128x192
HF, WF = 288, 400  # flow at 2x (flow_scale_multiplier x patch rounding)

rng = np.random.default_rng(0)
videos = jnp.asarray(rng.uniform(size=(B, F, 3, H, W)).astype(np.float32))
videos_flow = jnp.asarray(
    rng.uniform(size=(B, F, 3, HF, WF)).astype(np.float32)
)
batch = Batch(videos=videos, indices=jnp.tile(jnp.arange(F)[None], (B, 1)))
batch_flow = Batch(videos=videos_flow, indices=batch.indices)

predictor = GMFlowPredictor(FlowPredictorGMFlowCfg())  # random weights


def flow_fn(batch_for_flow, model_shape):
    return compute_bidirectional_flow(predictor.__call__, batch_for_flow, model_shape)


model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
    intrinsics=IntrinsicsSoftminCfg(
        num_procrustes_points=8192, num_candidates=60, regression=None
    ),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
trainer_cfg = PretrainTrainerCfg(lr=5e-5)
state, optimizer = init_pretrain_state(model_cfg, trainer_cfg)
step = jax.jit(
    make_pretrain_step(
        model_cfg, [LossFlowCfg()], optimizer, flow_fn, jax.random.PRNGKey(1)
    ),
    donate_argnums=(0,),
)

t0 = time.time()
for _ in range(3):
    state, metrics = step(state, batch, batch_flow)
print(f"# warmup {time.time() - t0:.0f}s loss={float(metrics['loss/total']):.4f}",
      file=sys.stderr, flush=True)

n = 10
t0 = time.time()
for _ in range(n):
    state, metrics = step(state, batch, batch_flow)
float(metrics["loss/total"])
dt = (time.time() - t0) / n
print(json.dumps({
    "metric": "pretrain_steps_per_sec",
    "value": round(1.0 / dt, 3),
    "unit": "steps/s",
    "batch": [B, F],
    "image_shape": [H, W],
    "flow": "gmflow-in-step",
}))
