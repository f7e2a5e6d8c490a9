"""Dump the optimized HLO of the reference-scale train step and print the
definition of named fusions (to map trace fusion names -> conv shapes for
the per-fusion hit list, docs/PERF_R5.md).

Usage: probe_hlo_fusions.py [fusion.3434 fusion.129 ...]
Writes the full HLO to /tmp/step_hlo.txt; prints root + conv ops of each
requested fusion.
"""
import re
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from flowmap_tpu.loss import LossFlowCfg, LossTrackingCfg
from flowmap_tpu.model import (
    BackboneMidasCfg,
    ExtrinsicsProcrustesCfg,
    IntrinsicsSoftminCfg,
    ModelCfg,
    RegressionCfg,
)
from flowmap_tpu.tracking import pack_tracks
from flowmap_tpu.training.overfit import (
    OverfitTrainerCfg,
    _autosize_warp_radius,
    init_train_state,
    make_train_step,
)
from flowmap_tpu.utils.synthetic import (
    SyntheticSceneCfg,
    make_scene,
    make_track_segments,
)

NUM_FRAMES, IMAGE_SHAPE = 150, (160, 224)
batch, flows, gt_depths = make_scene(
    SyntheticSceneCfg(num_frames=NUM_FRAMES, image_shape=IMAGE_SHAPE)
)
tracks = pack_tracks(
    make_track_segments(batch, gt_depths, interval=5, radius=20, grid_size=35),
    NUM_FRAMES,
)
model_cfg = ModelCfg(
    backbone=BackboneMidasCfg(pretrained=False, mapping="exp", bn="folded"),
    intrinsics=IntrinsicsSoftminCfg(regression=RegressionCfg(after_step=1000, window=100)),
    extrinsics=ExtrinsicsProcrustesCfg(num_points=1000),
)
model_cfg = _autosize_warp_radius(model_cfg, flows, IMAGE_SHAPE[0])
state, optimizer = init_train_state(model_cfg, trainer_cfg := OverfitTrainerCfg(lr=3e-5), NUM_FRAMES, IMAGE_SHAPE)
step = jax.jit(
    make_train_step(model_cfg, [LossFlowCfg(), LossTrackingCfg()], optimizer,
                    jax.random.PRNGKey(0), staged_vjp=False),
    donate_argnums=(0,),
)
text = step.lower(state, batch, flows, tracks).compile().as_text()
open("/tmp/step_hlo.txt", "w").write(text)
print(f"HLO written: {len(text)} bytes")

wanted = sys.argv[1:]
if not wanted:
    sys.exit(0)

# Parse fusion computations: `%name.N (args) -> type { ... }` plus the
# fusion instruction naming the computation.
# Find, for each wanted fusion instruction name, its called computation and
# the conv/dot lines inside.
for want in wanted:
    # fusion instruction line: `%fusion.3434 = ... fusion(...), kind=..., calls=%fused_computation.X`
    m = re.search(
        rf"[% ]{re.escape(want)} = ([^\n]*)", text
    )
    if not m:
        print(f"\n=== {want}: NOT FOUND")
        continue
    line = m.group(1)
    print(f"\n=== {want}\n  {line[:300]}")
    cm = re.search(r"calls=%?([\w.\-]+)", line)
    if not cm:
        continue
    comp = cm.group(1)
    # computation body
    bm = re.search(
        rf"^%?{re.escape(comp)} [^\n]*\{{(.*?)^\}}", text, re.S | re.M
    )
    if not bm:
        print("  (computation body not found)")
        continue
    body = bm.group(1)
    for op in re.findall(r"[^\n]*(?:convolution|dot)\([^\n]*", body):
        print("   ", op.strip()[:280])
