"""Device-trace the pretrain step at the reference budget shape and
summarize by HLO category + source (the pretrain analogue of probe_trace.py;
feeds the round-5 pretrain decomposition in BASELINE.md)."""
import collections
import glob
import gzip
import json
import os
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
H, W = 128, 192
HF, WF = 288, 400

rng = np.random.default_rng(0)
videos = jnp.asarray(rng.uniform(size=(B, F, 3, H, W)).astype(np.float32))
videos_flow = jnp.asarray(rng.uniform(size=(B, F, 3, HF, WF)).astype(np.float32))
batch = Batch(videos=videos, indices=jnp.tile(jnp.arange(F)[None], (B, 1)))
batch_flow = Batch(videos=videos_flow, indices=batch.indices)

_DTYPE = os.environ.get("PRETRAIN_PROBE_DTYPE", "bfloat16")
_CHUNK = int(os.environ.get("PRETRAIN_PROBE_CHUNK", "8"))
predictor = GMFlowPredictor(
    FlowPredictorGMFlowCfg(compute_dtype=_DTYPE, max_batch_size=_CHUNK)
)


def flow_fn(batch_for_flow, model_shape):
    return compute_bidirectional_flow(predictor.__call__, batch_for_flow, model_shape)


model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp"),
    intrinsics=IntrinsicsSoftminCfg(
        num_procrustes_points=8192, num_candidates=60, regression=None
    ),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
state, optimizer = init_pretrain_state(model_cfg, PretrainTrainerCfg(lr=5e-5))
step = jax.jit(
    make_pretrain_step(
        model_cfg, [LossFlowCfg()], optimizer, flow_fn, jax.random.PRNGKey(1)
    ),
    donate_argnums=(0,),
)

t0 = time.time()
for _ in range(2):
    state, metrics = step(state, batch, batch_flow)
print(f"# warmup {time.time() - t0:.0f}s loss={float(metrics['loss/total']):.2f}",
      file=sys.stderr, flush=True)

n_steps = 2
with jax.profiler.trace("/tmp/jax_trace_pretrain"):
    for _ in range(n_steps):
        state, metrics = step(state, batch, batch_flow)
    float(metrics["loss/total"])

path = sorted(glob.glob("/tmp/jax_trace_pretrain/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    data = json.load(f)
by_src, by_cat, by_name = collections.Counter(), collections.Counter(), collections.Counter()
while_span = 0.0
meta = {}
for e in data["traceEvents"]:
    if e.get("ph") != "X" or e.get("pid") != 3 or e.get("tid") != 3:
        continue
    d = e.get("dur", 0.0)
    args = e.get("args", {})
    cat = args.get("hlo_category", "?")
    # A `while` op's trace span COVERS its body: the body's fusions/kernels
    # are separate events inside the same span, so summing the while in
    # with them double-counts (round-5 lesson: the "chunk scan 470 ms"
    # was the GMFlow chunk loop's parent span, not extra work — device
    # totals that exceed measured wall-clock are the tell).
    if cat == "while" or e["name"].startswith("while"):
        while_span += d
        continue
    by_src[args.get("source", "?")] += d
    by_cat[cat] += d
    by_name[e["name"]] += d
    meta[e["name"]] = (args.get("source", "?"), args.get("tf_op", "")[:100])
total = sum(by_cat.values())
print(f"total device (flat ops, while parents excluded): "
      f"{total / n_steps / 1000:.1f} ms/step")
print(f"while parent spans (loop incl. body, for reference): "
      f"{while_span / n_steps / 1000:.1f} ms/step\n== by category ==")
for c, d in by_cat.most_common(12):
    print(f"{d / n_steps / 1000:9.2f} ms  {c}")
print("\n== by source ==")
for s, d in by_src.most_common(30):
    print(f"{d / n_steps / 1000:9.2f} ms  {s.replace('/root/repo/flowmap_tpu/', '')}")
print("\n== by op ==")
for name, d in by_name.most_common(30):
    src, tf = meta[name]
    print(f"{d / n_steps / 1000:9.2f} ms  {name:30s} {src.replace('/root/repo/flowmap_tpu/', ''):40s} {tf}")
