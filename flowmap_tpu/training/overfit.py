"""Per-scene overfitting loop — the reference's hot path, fully jitted.

Parity: `flowmap/model/model_wrapper_overfit.py` + Lightning Trainer
(`flowmap/overfit.py:94-112`), redesigned for XLA:

- One optimization step = one compiled function (model forward -> losses ->
  grads -> Adam), with batch/flows/tracks passed as device-resident pytrees.
- Steps are driven in chunks of `val_check_interval` through `lax.scan`, so
  the 2000-step loop costs ~40 dispatches instead of 2000 (dispatch latency
  matters more on TPU than GPU).
- The two-stage softmin->regressed intrinsics schedule (including the focal
  handoff) lives inside the compiled step (see
  `flowmap_tpu/model/intrinsics/intrinsics.py`) — no retracing at the stage
  boundary.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..loss.loss import LossCfg, compute_losses
from ..model.intrinsics.intrinsics import maybe_handoff_focal
from ..model.model import ModelCfg, ModelState, forward, init_model
from ..types import Batch, Flows, Tracks


@dataclass(frozen=True)
class OverfitTrainerCfg:
    lr: float = 3e-5
    max_steps: int = 2000
    val_check_interval: int = 50
    seed: int = 0
    # Compute the step gradient as explicitly chained VJPs (backbone /
    # intrinsics sweep / pose+loss) separated by optimization barriers,
    # instead of one monolithic backward. Numerically identical (chain rule);
    # kept as a fusion-bounding fallback (the round-1 TPU fault it was built
    # to dodge turned out to be a gather formulation bug, now fixed — see
    # docs/TPU_FAULT_NOTES.md).
    staged_vjp: bool = False
    # Steps per compiled program. 1 (default) jits the single step and drives
    # it from Python with a donated carry — dispatch latency is microseconds
    # against a ~1s step, and compile time stays bounded. Larger values wrap
    # `lax.scan` around the step (useful if steps ever get dispatch-bound,
    # e.g. tiny scenes), at a steep XLA compile-time cost per scene shape.
    steps_per_program: int = 1
    # Frame-axis sharding of the per-scene step (SURVEY §2.5): "auto" shards
    # frames over all local devices when more than one is visible and the
    # frame count divides the device count; "none" forces the single-device
    # step. On one chip (this image) both are identical.
    sharding: str = "auto"
    # Cross-shard communication: "gspmd" trusts the SPMD partitioner;
    # "explicit" routes the pose-chain prefix product and the later-frame
    # halo through hand-written shard_map collectives
    # (parallel/collectives.py). Step-equivalent (tests/test_explicit_step.py).
    collectives: str = "gspmd"


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    model_state: ModelState
    step: jax.Array  # int32 scalar


def init_train_state(
    model_cfg: ModelCfg,
    trainer_cfg: OverfitTrainerCfg,
    num_frames: int,
    image_shape: tuple[int, int],
) -> tuple[TrainState, optax.GradientTransformation]:
    key = jax.random.PRNGKey(trainer_cfg.seed)
    # One compiled program for the whole init: eager per-layer init would
    # dispatch hundreds of tiny XLA programs (≈95 s through a remote-compile
    # tunnel vs ~1 s fused).
    params, model_state = jax.jit(
        lambda k: init_model(
            model_cfg, k, num_frames=num_frames, image_shape=image_shape
        )
    )(key)
    # NB optax.flatten(adam) measured ~1 ms/step SLOWER at reference scale
    # (the flatten/unflatten copies outweigh the per-leaf fusion overhead).
    optimizer = optax.adam(trainer_cfg.lr)
    opt_state = jax.jit(optimizer.init)(params)
    return (
        TrainState(
            params=params,
            opt_state=opt_state,
            model_state=model_state,
            step=jnp.asarray(0, jnp.int32),
        ),
        optimizer,
    )


def _staged_value_and_grad(
    model_cfg: ModelCfg,
    loss_cfgs: Sequence[LossCfg],
    params: dict,
    state: "TrainState",
    batch: Batch,
    flows: Flows,
    tracks,
    key: jax.Array,
):
    """Step gradient as five chained VJP regions (exact — chain rule):

        backbone -> sweep -> unproject -> procrustes -> losses

    with `optimization_barrier` on every inter-region cotangent. XLA
    miscompiles the single fused backward of Procrustes pose estimation x
    flow reprojection at the reference scale (TPU kernel fault — each
    region's backward alone compiles and runs correctly, the joint one
    faults); the explicit chain keeps every backward region in a separately
    schedulable program slice, at the cost of materializing the intermediate
    cotangents (surfaces, poses, intrinsics — small next to activations).
    """
    from ..model.backbone import apply_backbone
    from ..model.extrinsics import apply_extrinsics
    from ..model.intrinsics import apply_intrinsics
    from ..ops.geometry import sample_image_grid, unproject
    from ..types import ModelOutput

    h, w = batch.videos.shape[-2:]
    k_intrinsics, k_extrinsics = jax.random.split(key)
    mstate = state.model_state

    def tree_add(*trees):
        return jax.tree_util.tree_map(lambda *xs: sum(xs), *trees)

    barrier = jax.lax.optimization_barrier

    def backbone_fn(p):
        bo = apply_backbone(model_cfg.backbone, p["backbone"], batch, flows)
        if not model_cfg.use_correspondence_weights:
            bo = bo.replace(weights=jnp.ones_like(bo.weights))
        return bo

    def sweep_fn(p, bo):
        k, new_intr_state = apply_intrinsics(
            model_cfg.intrinsics,
            p["intrinsics"],
            mstate.intrinsics,
            batch,
            flows,
            bo,
            jnp.asarray(state.step),
            k_intrinsics,
            train=True,
        )
        return k, new_intr_state

    def surfaces_fn(bo, k):
        xy, _ = sample_image_grid((h, w), dtype=batch.videos.dtype)
        return unproject(xy, bo.depths, k[:, :, None, None])

    def extrinsics_fn(p, bo, surfaces):
        return apply_extrinsics(
            model_cfg.extrinsics,
            p["extrinsics"],
            batch,
            flows,
            bo,
            surfaces,
            k_extrinsics,
        )

    def losses_fn(bo, surfaces, k, t):
        output = ModelOutput(
            depths=bo.depths,
            surfaces=surfaces,
            intrinsics=k,
            extrinsics=t,
            backward_correspondence_weights=bo.weights,
        )
        total, individual = compute_losses(
            loss_cfgs, flows, tracks, output, state.step, (h, w)
        )
        return total, (individual, output)

    bo, vjp_backbone = jax.vjp(backbone_fn, params)
    k, vjp_sweep, new_intr_state = jax.vjp(sweep_fn, params, bo, has_aux=True)
    surfaces, vjp_surfaces = jax.vjp(surfaces_fn, bo, k)
    t, vjp_extr = jax.vjp(extrinsics_fn, params, bo, surfaces)
    total, vjp_losses, (individual, output) = jax.vjp(
        losses_fn, bo, surfaces, k, t, has_aux=True
    )

    g_bo_l, g_surf_l, g_k_l, g_t = vjp_losses(jnp.ones_like(total))
    g_p_e, g_bo_e, g_surf_e = vjp_extr(barrier(g_t))
    g_surf = barrier(tree_add(g_surf_l, g_surf_e))
    g_bo_s, g_k_s = vjp_surfaces(g_surf)
    g_k = barrier(tree_add(g_k_l, g_k_s))
    g_p_i, g_bo_i = vjp_sweep(g_k)
    g_bo = barrier(tree_add(g_bo_l, g_bo_e, g_bo_s, g_bo_i))
    (g_p_b,) = vjp_backbone(g_bo)
    grads = tree_add(g_p_e, g_p_i, g_p_b)

    new_model_state = ModelState(intrinsics=new_intr_state)
    return (total, (individual, new_model_state, output)), grads


def make_train_step(
    model_cfg: ModelCfg,
    loss_cfgs: Sequence[LossCfg],
    optimizer: optax.GradientTransformation,
    base_key: jax.Array,
    staged_vjp: bool = False,
) -> Callable:
    """Build the single-step update: (state, batch, flows, tracks) -> state, metrics.

    `staged_vjp` defaults to False — the same monolithic backward the CLI
    ships (`OverfitTrainerCfg.staged_vjp`); bench.py and the CLI therefore
    measure/run one graph. Measured on v5e at reference scale the two
    variants are within noise (126.5 vs 126.9 ms/step), so the simpler
    graph is the default and the staged chain stays as a fusion-bounding
    fallback."""

    def train_step(
        state: TrainState,
        batch: Batch,
        flows: Flows,
        tracks: Optional[Sequence[Tracks]],
    ) -> tuple[TrainState, dict]:
        h, w = batch.videos.shape[-2:]
        key = jax.random.fold_in(base_key, state.step)

        # Stage-boundary focal handoff (pure param rewrite, usually identity).
        params = dict(state.params)
        params["intrinsics"] = maybe_handoff_focal(
            model_cfg.intrinsics,
            params["intrinsics"],
            state.model_state.intrinsics,
            state.step,
        )

        if staged_vjp:
            (total, (individual, new_model_state, output)), grads = (
                _staged_value_and_grad(
                    model_cfg, loss_cfgs, params, state, batch, flows, tracks, key
                )
            )
        else:

            def loss_fn(p):
                output, new_model_state = forward(
                    model_cfg,
                    p,
                    state.model_state,
                    batch,
                    flows,
                    state.step,
                    key,
                    train=True,
                )
                total, individual = compute_losses(
                    loss_cfgs, flows, tracks, output, state.step, (h, w)
                )
                return total, (individual, new_model_state, output)

            (total, (individual, new_model_state, output)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params)
            )

        updates, new_opt_state = optimizer.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        metrics = {"loss/total": total, **{f"loss/{k}": v for k, v in individual.items()}}
        if batch.intrinsics is not None:
            metrics["intrinsics/fx_error"] = jnp.abs(
                jnp.mean(batch.intrinsics[..., 0, 0])
                - jnp.mean(output.intrinsics[..., 0, 0])
            )
            metrics["intrinsics/fy_error"] = jnp.abs(
                jnp.mean(batch.intrinsics[..., 1, 1])
                - jnp.mean(output.intrinsics[..., 1, 1])
            )

        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            model_state=new_model_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_train_step_dispatched(
    model_cfg: ModelCfg,
    loss_cfgs: Sequence[LossCfg],
    optimizer: optax.GradientTransformation,
    base_key: jax.Array,
) -> Callable:
    """Train step as SEPARATE jit dispatches per VJP region.

    Same exact chain-rule decomposition as `_staged_value_and_grad`, but each
    region's forward+backward is its own XLA program (backward programs
    recompute their region's forward — remat at the region level). This is
    the strongest isolation against the TPU miscompile of the fused
    Procrustes x reprojection backward: ops in different programs cannot be
    scheduled into one faulting kernel. Costs one extra forward per region
    and ~7 dispatches/step instead of 1.

    Returns a PYTHON callable (not jittable): (state, batch, flows, tracks)
    -> (state, metrics). Numerics match `make_train_step` exactly.
    """
    from ..model.backbone import apply_backbone
    from ..model.extrinsics import apply_extrinsics
    from ..model.intrinsics import apply_intrinsics
    from ..ops.geometry import sample_image_grid, unproject
    from ..types import ModelOutput

    def step_keys(step):
        return jax.random.split(jax.random.fold_in(base_key, step))

    @jax.jit
    def handoff(params, mstate, step):
        params = dict(params)
        params["intrinsics"] = maybe_handoff_focal(
            model_cfg.intrinsics, params["intrinsics"], mstate.intrinsics, step
        )
        return params

    def backbone_fn(p, batch, flows):
        bo = apply_backbone(model_cfg.backbone, p["backbone"], batch, flows)
        if not model_cfg.use_correspondence_weights:
            bo = bo.replace(weights=jnp.ones_like(bo.weights))
        return bo

    b_fwd = jax.jit(backbone_fn)

    @jax.jit
    def b_bwd(p, batch, flows, g_bo):
        _, vjp = jax.vjp(lambda pp: backbone_fn(pp, batch, flows), p)
        (g_p,) = vjp(g_bo)
        return g_p

    def sweep_fn(p, mstate, batch, flows, bo, step):
        k_intr, _ = step_keys(step)
        return apply_intrinsics(
            model_cfg.intrinsics,
            p["intrinsics"],
            mstate.intrinsics,
            batch,
            flows,
            bo,
            jnp.asarray(step),
            k_intr,
            train=True,
        )

    i_fwd = jax.jit(sweep_fn)

    @jax.jit
    def i_bwd(p, mstate, batch, flows, bo, step, g_k_parts):
        g_k = jax.tree_util.tree_map(lambda *x: sum(x), *g_k_parts)
        _, vjp = jax.vjp(
            lambda pp, b: sweep_fn(pp, mstate, batch, flows, b, step)[0], p, bo
        )
        return vjp(g_k)

    def extr_fn(p, batch, flows, bo, k, step):
        h, w = batch.videos.shape[-2:]
        _, k_extr = step_keys(step)
        xy, _ = sample_image_grid((h, w), dtype=batch.videos.dtype)
        surfaces = unproject(xy, bo.depths, k[:, :, None, None])
        return apply_extrinsics(
            model_cfg.extrinsics, p["extrinsics"], batch, flows, bo, surfaces,
            k_extr,
        )

    e_fwd = jax.jit(extr_fn)

    @jax.jit
    def e_bwd(p, batch, flows, bo, k, step, g_t):
        _, vjp = jax.vjp(
            lambda pp, b, kk: extr_fn(pp, batch, flows, b, kk, step), p, bo, k
        )
        return vjp(g_t)

    def loss_fn(batch, flows, tracks, bo, k, t, step):
        h, w = batch.videos.shape[-2:]
        xy, _ = sample_image_grid((h, w), dtype=batch.videos.dtype)
        surfaces = unproject(xy, bo.depths, k[:, :, None, None])
        output = ModelOutput(
            depths=bo.depths,
            surfaces=surfaces,
            intrinsics=k,
            extrinsics=t,
            backward_correspondence_weights=bo.weights,
        )
        total, individual = compute_losses(
            loss_cfgs, flows, tracks, output, step, (h, w)
        )
        return total, (individual, output)

    @jax.jit
    def l_all(batch, flows, tracks, bo, k, t, step):
        def f(b, kk, tt):
            total, aux = loss_fn(batch, flows, tracks, b, kk, tt, step)
            return total, aux

        total, vjp, (individual, output) = jax.vjp(f, bo, k, t, has_aux=True)
        g_bo, g_k, g_t = vjp(jnp.ones_like(total))
        return total, individual, output, g_bo, g_k, g_t

    @jax.jit
    def adam_update(params, opt_state, g_parts, step):
        grads = jax.tree_util.tree_map(lambda *x: sum(x), *g_parts)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state

    @jax.jit
    def add_trees(*trees):
        return jax.tree_util.tree_map(lambda *x: sum(x), *trees)

    def train_step(state, batch, flows, tracks):
        step = state.step
        params = handoff(state.params, state.model_state, step)

        bo = b_fwd(params, batch, flows)
        k, new_intr_state = i_fwd(
            params, state.model_state, batch, flows, bo, step
        )
        t = e_fwd(params, batch, flows, bo, k, step)
        total, individual, output, g_bo_l, g_k_l, g_t = l_all(
            batch, flows, tracks, bo, k, t, step
        )
        g_p_e, g_bo_e, g_k_e = e_bwd(params, batch, flows, bo, k, step, g_t)
        g_p_i, g_bo_i = i_bwd(
            params, state.model_state, batch, flows, bo, step, (g_k_l, g_k_e)
        )
        g_bo = add_trees(g_bo_l, g_bo_e, g_bo_i)
        g_p_b = b_bwd(params, batch, flows, g_bo)

        new_params, new_opt_state = adam_update(
            params, state.opt_state, (g_p_e, g_p_i, g_p_b), step
        )

        metrics = {
            "loss/total": total,
            **{f"loss/{kk}": v for kk, v in individual.items()},
        }
        if batch.intrinsics is not None:
            metrics["intrinsics/fx_error"] = jnp.abs(
                jnp.mean(batch.intrinsics[..., 0, 0])
                - jnp.mean(output.intrinsics[..., 0, 0])
            )
            metrics["intrinsics/fy_error"] = jnp.abs(
                jnp.mean(batch.intrinsics[..., 1, 1])
                - jnp.mean(output.intrinsics[..., 1, 1])
            )

        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            model_state=ModelState(intrinsics=new_intr_state),
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_train_chunk(train_step: Callable, chunk_size: int) -> Callable:
    """Scan `chunk_size` steps inside one compiled call."""

    def chunk(state, batch, flows, tracks):
        def body(carry, _):
            new_state, metrics = train_step(carry, batch, flows, tracks)
            return new_state, metrics

        return jax.lax.scan(body, state, None, length=chunk_size)

    # Donating the carried state lets XLA reuse its buffers across chunks.
    return jax.jit(chunk, donate_argnums=(0,))


_EVAL_FORWARD_CACHE: dict = {}


def eval_forward(
    model_cfg: ModelCfg,
    state: TrainState,
    batch: Batch,
    flows: Flows,
    key: Optional[jax.Array] = None,
):
    """Model forward for validation/export at the current step (one jitted
    program — eager evaluation would dispatch every conv separately, which is
    pathologically slow through a remote-compile tunnel).

    Applies the stage-boundary focal handoff first: when evaluating exactly at
    `regression.after_step` (before the training step that persists the
    handoff), the raw regressed focal is still its placeholder value.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    jitted = _EVAL_FORWARD_CACHE.get(model_cfg)
    if jitted is None:

        def run(params, model_state, batch, flows, step, key):
            params = dict(params)
            params["intrinsics"] = maybe_handoff_focal(
                model_cfg.intrinsics,
                params["intrinsics"],
                model_state.intrinsics,
                step,
            )
            output, _ = forward(
                model_cfg, params, model_state, batch, flows, step, key,
                train=False,
            )
            return output

        jitted = jax.jit(run)
        _EVAL_FORWARD_CACHE[model_cfg] = jitted

    return jitted(
        state.params, state.model_state, batch, flows, state.step, key
    )


def _autosize_warp_radius(model_cfg: ModelCfg, flows: Flows, height: int) -> ModelCfg:
    import dataclasses

    import numpy as np

    backbone = model_cfg.backbone
    if getattr(backbone, "warp_impl", None) not in ("fused", "matmul", "pallas"):
        return model_cfg
    from ..ops.warp import radius_for_flows

    height_ = flows.backward.shape[-3]
    width = flows.backward.shape[-2]
    radius = radius_for_flows(np.asarray(flows.backward[..., 1]), height_)
    radius_x = radius_for_flows(np.asarray(flows.backward[..., 0]), width)
    # Exact bounds for the half-resolution shift-stencil warp: measure the
    # 2x2-pooled flow the native-weights path actually warps with (pooling
    # matches backbone_midas.py; tap count is quadratic in these radii).
    half = {}
    if height_ % 2 == 0 and width % 2 == 0:
        fb = np.asarray(flows.backward)
        b, p, _, _, _ = fb.shape
        fb_half = fb.reshape(b, p, height_ // 2, 2, width // 2, 2, 2).mean(
            axis=(3, 5)
        )
        half = dict(
            warp_radius_half=radius_for_flows(
                fb_half[..., 1], height_ // 2, margin=0
            ),
            warp_radius_half_x=radius_for_flows(
                fb_half[..., 0], width // 2, margin=0
            ),
        )
    return dataclasses.replace(
        model_cfg,
        backbone=dataclasses.replace(
            backbone, warp_radius=radius, warp_radius_x=radius_x, **half
        ),
    )


def run_overfit(
    model_cfg: ModelCfg,
    loss_cfgs: Sequence[LossCfg],
    trainer_cfg: OverfitTrainerCfg,
    batch: Batch,
    flows: Flows,
    tracks: Optional[Sequence[Tracks]] = None,
    on_validation: Optional[Callable] = None,
    init_params: Optional[dict] = None,
) -> tuple[TrainState, dict]:
    """Run the full overfitting schedule; returns final state + timing info.

    `on_validation(state, step, metrics_history)` is called every
    `val_check_interval` steps (the reference's validation/visualization hook).
    """
    _, f, _, h, w = batch.videos.shape
    state, optimizer = init_train_state(model_cfg, trainer_cfg, f, (h, w))

    if init_params is not None:
        # Non-strict weights-only load (reference overfit.py:89-92): leaves
        # missing entries at their initialization; optimizer state restarts.
        def merge(target, loaded):
            if isinstance(target, dict):
                return {
                    k: merge(v, loaded[k]) if isinstance(loaded, dict) and k in loaded else v
                    for k, v in target.items()
                }
            if isinstance(target, list):
                if isinstance(loaded, list) and len(loaded) == len(target):
                    return [merge(t, l) for t, l in zip(target, loaded)]
                return target
            return loaded if loaded is not None else target

        state = state.replace(params=merge(state.params, init_params))

    # Pack ragged track segments into one uniform vmapped computation (much
    # smaller XLA graphs; numerically identical — see tracking.pack_tracks).
    if isinstance(tracks, (list, tuple)) and len(tracks) > 0:
        from ..tracking import pack_tracks

        tracks = pack_tracks(list(tracks), f)

    # Size the matmul-warp window from the actual flow field so the warp is
    # exact for this scene (ops/warp.py).
    model_cfg = _autosize_warp_radius(model_cfg, flows, h)
    key = jax.random.PRNGKey(trainer_cfg.seed + 1)
    train_step = make_train_step(
        model_cfg, loss_cfgs, optimizer, key, staged_vjp=trainer_cfg.staged_vjp
    )

    # Frame-shard the step over all local devices when possible (the shipped
    # multi-chip path — SURVEY §7.1 step 10; previously only reachable via
    # parallel/ directly). On a single chip this branch never triggers.
    n_devices = len(jax.devices())
    shard_frames = (
        trainer_cfg.sharding == "auto" and n_devices > 1 and f % n_devices == 0
    )
    interval = min(trainer_cfg.val_check_interval, trainer_cfg.max_steps)
    if shard_frames:
        from ..parallel import (
            make_mesh,
            make_sharded_train_step,
            shard_batch,
            shard_flows,
        )

        if trainer_cfg.steps_per_program > 1:
            # The sharded path dispatches per step (scan-chunking measured a
            # 55 ms/step regression even single-device — docs/PERF_R5.md).
            print(
                "Note: trainer.steps_per_program is ignored under frame "
                "sharding (per-step dispatch; see docs/PERF_R5.md)."
            )
        mesh = make_mesh(n_data=1, n_frame=n_devices)
        step_fn = make_sharded_train_step(
            train_step, mesh, state, batch, collectives=trainer_cfg.collectives
        )
        batch = shard_batch(batch, mesh)
        flows = shard_flows(flows, mesh)

        def chunk(state, batch, flows, tracks):
            return step_fn(state, batch, flows, tracks)

        per_call = 1
    elif trainer_cfg.steps_per_program > 1:
        chunk = make_train_chunk(
            train_step, min(trainer_cfg.steps_per_program, interval)
        )
        per_call = min(trainer_cfg.steps_per_program, interval)
    else:
        step_fn = jax.jit(train_step, donate_argnums=(0,))

        def chunk(state, batch, flows, tracks):
            state, metrics = step_fn(state, batch, flows, tracks)
            return state, metrics

        per_call = 1

    t_start = time.time()
    history: dict[str, list] = {}
    steps_done = 0
    while steps_done < trainer_cfg.max_steps:
        state, metrics = chunk(state, batch, flows, tracks)
        steps_done += per_call
        if steps_done % interval != 0 and steps_done < trainer_cfg.max_steps:
            continue
        # Fetch the last step's metrics (one host sync per interval).
        fetched = {
            k: float(v[-1] if getattr(v, "ndim", 0) else v)
            for k, v in metrics.items()
        }
        for k, v in fetched.items():
            history.setdefault(k, []).append(v)
        if on_validation is not None:
            on_validation(state, steps_done, fetched)

    timing = {"optimization_runtime": time.time() - t_start}
    return state, {"history": history, **timing}
