"""MiDaS depth backbone (Flax) + correspondence-weight MLP.

Parity target: `flowmap/model/backbone/backbone_midas.py:16-127` (MiDaS via
torch.hub, head split so penultimate features feed a per-pixel weight MLP).
The Flax port lives in `midas_net.py`; this module wires it into the backbone
interface: depth mapping ("original": 1e3/(x+0.1), "exp": exp(x/1000)+0.01),
feature warping by backward flow, and the sigmoid weight MLP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional

import jax
import jax.numpy as jnp

from ...ops.geometry import earlier, later, sample_image_grid
from ...ops.grid_sample import grid_sample_2d
from ...ops.resize import resize_bilinear
from ...types import Batch, BackboneOutput, Flows
from .midas_net import MidasSmall, midas_small_init


@dataclass(frozen=True)
class BackboneMidasCfg:
    name: Literal["midas"] = "midas"
    pretrained: bool = True
    weight_sensitivity: Optional[float] = None
    mapping: Literal["original", "exp"] = "original"
    model: Literal["DPT_Large", "MiDaS_small"] = "MiDaS_small"
    # TPU-native knob: run the conv net in bfloat16 (MXU-native, halves HBM
    # traffic); geometry and losses stay float32. Depth/feature outputs are
    # cast back to float32.
    compute_dtype: Literal["float32", "bfloat16"] = "bfloat16"
    # BatchNorm handling for MiDaS_small's encoder: "batch" = batch
    # statistics (the reference's Lightning train-mode behavior); "folded" =
    # BN folded into the preceding conv (how converted pretrained
    # checkpoints arrive; also an ablation that removes every cross-frame
    # reduction from the net).
    bn: Literal["batch", "folded"] = "batch"
    # Rematerialize the depth net in the backward pass: trades ~1/3 extra
    # forward FLOPs for a large cut in live activation memory (the 150-frame
    # reference workload does not fit HBM otherwise).
    remat: bool = False
    # Feature-warp implementation. "fused" = single Pallas pass computing
    # upsample-x2 + warp + weight MLP straight from the native-resolution
    # decoder features (ops/pallas/corr_weights.py; fastest — no full-res
    # feature map ever exists); "pallas" = fused VMEM warp kernel
    # (ops/pallas/warp_kernel.py; no gradient to the frozen flow);
    # "matmul" = gather-free windowed one-hot matmuls (ops/warp.py);
    # "gather" = torch-semantics grid_sample (any displacement). The
    # fused/pallas/matmul paths are exact while vertical flow displacements
    # stay within warp_radius pixels (callers size the radius from the
    # flow); "fused" additionally needs MiDaS_small, batch 1, h % 16 == 0,
    # w <= 256, radius <= 6, and falls back to "pallas" otherwise. The
    # native-resolution weight path additionally uses the static
    # shift-window VPU warp (ops/warp.py:warp_bilinear_shifts) whenever
    # BOTH radii are small (the common case after autosizing), which is
    # several times faster than any kernel formulation there.
    warp_impl: Literal["fused", "pallas", "matmul", "gather"] = "fused"
    warp_radius: int = 16
    # Horizontal displacement bound (pixels, feature resolution) for the
    # shift-window warp; sized from the flow like warp_radius.
    warp_radius_x: int = 16
    # Exact half-resolution displacement bounds for the native-weights
    # shift-stencil warp, measured on the 2x2-pooled flow by
    # `_autosize_warp_radius` (tap count is quadratic in these). None falls
    # back to the conservative derivation from warp_radius(_x).
    warp_radius_half: Optional[int] = None
    warp_radius_half_x: Optional[int] = None
    # Evaluate the native-resolution weight MLP with the fused Pallas kernel
    # (ops/pallas/weight_mlp.py) instead of the XLA dot chain. Measured at
    # reference scale the kernel is ~3 ms/step SLOWER (its transposed
    # contractions relayout each block in-kernel), so the XLA chain stays
    # the default; the kernel is kept as a tested option for shapes where
    # the 128-wide HBM intermediates dominate.
    fused_weight_mlp: bool = False
    # Where the correspondence-weight MLP runs. The reference upsamples the
    # half-resolution decoder features x2, warps them by full-res flow, and
    # evaluates the MLP per full-res pixel (backbone_midas.py:57-64,75-127).
    # The upsample adds no information — full-res features are a bilinear
    # blend of the native ones — so "native" (TPU-first default) warps and
    # evaluates at the feature grid's own resolution and bilinearly
    # upsamples the resulting scalar weight map instead of 64 feature
    # channels: ~4x less compute and HBM traffic for an equally-informed,
    # slightly smoother gating field. "full" reproduces the reference
    # formulation exactly (the fused kernel or the warp+MLP composition).
    weights_resolution: Literal["full", "native"] = "native"


# Channel width of the penultimate decoder features per model variant
# (reference: backbone_midas.py:60-64).
_WEIGHT_CHANNELS = {"MiDaS_small": 64, "DPT_Large": 256}


def init_midas(
    cfg: BackboneMidasCfg,
    num_frames: Optional[int],
    image_shape: Optional[tuple[int, int]],
    key: jax.Array,
) -> dict:
    k_net, k_mlp = jax.random.split(key)
    if cfg.model == "MiDaS_small":
        params: dict = {"midas": midas_small_init(k_net, fold_bn=cfg.bn == "folded")}
    else:
        from .dpt_net import dpt_large_init

        params = {"midas": dpt_large_init(k_net)}
    if cfg.weight_sensitivity is None:
        c = _WEIGHT_CHANNELS[cfg.model]
        params["corr_weighter"] = _init_weight_mlp(k_mlp, [c * 2, 128, 64, 1])
    else:
        assert num_frames is not None and image_shape is not None
        params["weights"] = jnp.zeros(
            (num_frames - 1, *image_shape), dtype=jnp.float32
        )
    return params


def _init_weight_mlp(key: jax.Array, dims: list[int]) -> list[dict]:
    """Kaiming-normal (fan_in, relu) init, matching `make_net`
    (backbone_midas.py:16-30)."""
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        std = (2.0 / dims[i]) ** 0.5
        layers.append(
            {
                "kernel": std * jax.random.normal(sub, (dims[i], dims[i + 1])),
                "bias": jnp.zeros((dims[i + 1],)),
            }
        )
    return layers


def _apply_weight_mlp(layers: list[dict], x: jax.Array) -> jax.Array:
    for i, layer in enumerate(layers):
        x = x @ layer["kernel"] + layer["bias"]
        if i + 1 < len(layers):
            x = jax.nn.relu(x)
    return x


def apply_midas(
    cfg: BackboneMidasCfg,
    params: dict,
    batch: Batch,
    flows: Flows,
) -> BackboneOutput:
    b, f, _, h, w = batch.videos.shape

    videos = batch.videos.reshape(b * f, 3, h, w)
    # The Flax MiDaS returns (head_output, penultimate_features); the torch
    # reference splits scratch.output_conv off the hub model to the same end.
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    net_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params["midas"]
    )
    if cfg.model == "MiDaS_small":
        net = lambda p, v: MidasSmall.apply_split(p, v, mapping=cfg.mapping)
    else:
        from .dpt_net import DptLarge

        net = lambda p, v: DptLarge.apply_split(p, v, mapping=cfg.mapping)
    if cfg.remat:
        net = jax.checkpoint(net)
    head_out, features = net(net_params, videos.astype(dtype))
    head_out = head_out.astype(jnp.float32)
    # Features stay in the compute dtype through the resize/warp/MLP: the
    # warp is the biggest gather in the model and bf16 halves its bytes.

    if cfg.mapping == "original":
        depths = 1e3 / (head_out + 0.1)
    else:  # "exp" — for use with random initialization
        depths = jnp.exp(head_out / 1000.0) + 0.01

    depths = depths.reshape(b, f, h, w)

    cn, hn, wn = features.shape[1], features.shape[2], features.shape[3]

    # Native-resolution weights (TPU-first default, see cfg docstring): warp
    # the half-res features by 2x2-mean-pooled flow (box-filtered bilinear
    # downsample of the normalized flow field — exact for factor 2 at
    # half-pixel centers), run the MLP on the native grid, and upsample the
    # scalar weight map. 1/4 the pixels of the reference formulation and the
    # upsample moves from 64 channels to 1.
    if (
        cfg.weight_sensitivity is None
        and cfg.weights_resolution == "native"
        and (2 * hn, 2 * wn) == (h, w)
    ):
        fb = flows.backward.astype(jnp.float32)
        fb_half = fb.reshape(b, f - 1, hn, 2, wn, 2, 2).mean(axis=(3, 5))
        xy, _ = sample_image_grid((hn, wn), dtype=jnp.float32)
        grid = (xy + fb_half) * 2.0 - 1.0  # (b, f-1, hn, wn, 2)
        flat_grid = grid.reshape(b * (f - 1), hn, wn, 2)
        # Vertical excursions shrink by the downsample factor. Prefer the
        # exact pooled-flow bounds when the autosizer measured them; the
        # fallback derivation keeps a +1 safety margin.
        if cfg.warp_radius_half is not None:
            radius = max(1, cfg.warp_radius_half)
            radius_x = max(1, cfg.warp_radius_half_x or radius)
        else:
            radius = max(2, (cfg.warp_radius + 1) // 2 + 1)
            radius_x = max(2, (cfg.warp_radius_x + 1) // 2 + 1)
        # Shift-window stencil warp whenever the tap window is small: all
        # NHWC, all elementwise — no Pallas dispatch, no layout churn.
        use_shifts = (
            cfg.warp_impl in ("fused", "matmul")
            and (2 * radius + 2) * (2 * radius_x + 2) <= 256
        )
        if use_shifts:
            from ...ops.pallas.shift_warp import warp_shifts_tpu

            feats_nhwc = (
                jnp.transpose(features, (0, 2, 3, 1)).reshape(b, f, hn, wn, cn)
                / 20.0
            )
            earlier_f = earlier(feats_nhwc).reshape(b * (f - 1), hn, wn, cn)
            warped_nhwc = warp_shifts_tpu(
                earlier_f,
                jax.lax.stop_gradient(flat_grid.astype(jnp.float32)),
                radius,
                radius_x,
            )
            later_nhwc = later(feats_nhwc).reshape(b * (f - 1), hn, wn, cn)
        else:
            feats = (features / 20.0).reshape(b, f, cn, hn, wn)
            flat_feats = earlier(feats).reshape(b * (f - 1), cn, hn, wn)
            if cfg.warp_impl in ("fused", "pallas"):
                from ...ops.pallas.warp_kernel import warp_features

                warped = warp_features(
                    flat_feats,
                    jax.lax.stop_gradient(flat_grid.astype(flat_feats.dtype)),
                    radius,
                )
            elif cfg.warp_impl == "matmul":
                from ...ops.warp import warp_bilinear_matmul

                warped = warp_bilinear_matmul(
                    flat_feats, flat_grid.astype(flat_feats.dtype), radius=radius
                )
            else:
                warped = grid_sample_2d(
                    flat_feats,
                    jax.lax.stop_gradient(flat_grid),
                    padding_mode="zeros",
                )
            warped_nhwc = jnp.transpose(warped, (0, 2, 3, 1))
            later_nhwc = jnp.transpose(
                later(feats).reshape(b * (f - 1), cn, hn, wn), (0, 2, 3, 1)
            )
        mlp_params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype), params["corr_weighter"]
        )
        layer0 = mlp_params[0]
        w_a = layer0["kernel"][:cn]
        w_b = layer0["kernel"][cn:]
        if cfg.fused_weight_mlp and len(mlp_params) == 3:
            # Fused per-pixel MLP: every 128/64-wide intermediate stays in
            # VMEM (ops/pallas/weight_mlp.py; opt-in — see cfg docstring).
            from ...ops.pallas.weight_mlp import weight_mlp

            n_pix = b * (f - 1) * hn * wn
            logits = weight_mlp(
                warped_nhwc.reshape(n_pix, cn),
                later_nhwc.reshape(n_pix, cn),
                (
                    (w_a, w_b, layer0["bias"]),
                    (mlp_params[1]["kernel"], mlp_params[1]["bias"]),
                    (mlp_params[2]["kernel"], mlp_params[2]["bias"]),
                ),
            ).reshape(b * (f - 1), hn, wn)
            weights_half = jnp.clip(jax.nn.sigmoid(logits), min=1e-4)
        else:
            x = (
                jnp.einsum("nhwc,ck->nhwk", warped_nhwc, w_a)
                + jnp.einsum("nhwc,ck->nhwk", later_nhwc, w_b)
                + layer0["bias"]
            )
            x = jax.nn.relu(x)
            logits = _apply_weight_mlp(mlp_params[1:], x).astype(jnp.float32)
            weights_half = jnp.clip(jax.nn.sigmoid(logits[..., 0]), min=1e-4)
        weights = resize_bilinear(weights_half[:, None], (h, w))[:, 0]
        return BackboneOutput(
            depths=depths, weights=weights.reshape(b, f - 1, h, w)
        )

    # Fused full-resolution path: weights straight from the native (h/2,
    # w/2) decoder features — the x2 upsample, the warp, and the MLP all
    # happen inside one Pallas kernel; no full-resolution feature map is
    # ever materialized (ops/pallas/corr_weights.py). Gradients flow to the
    # features and the MLP; the flow grid is frozen (as in every path).
    if (
        cfg.warp_impl == "fused"
        and cfg.weight_sensitivity is None
        and b == 1
        and cn == 64
        and (2 * hn, 2 * wn) == (h, w)
        and h % 16 == 0
        and wn <= 128
        and cfg.warp_radius <= 6
    ):
        from ...ops.pallas.corr_weights import corr_weights

        xy, _ = sample_image_grid((h, w), dtype=jnp.float32)
        grid = (xy + flows.backward) * 2.0 - 1.0  # (1, f-1, h, w, 2)
        weights = corr_weights(
            jnp.transpose(features, (0, 2, 3, 1)),
            grid[0],
            params["corr_weighter"],
            cfg.warp_radius,
        )[None]
        return BackboneOutput(depths=depths, weights=weights)

    features = resize_bilinear(features, (h, w)) / 20.0
    features = features.reshape(b, f, -1, h, w)

    if cfg.weight_sensitivity is None:
        xy, _ = sample_image_grid((h, w), dtype=videos.dtype)
        grid = (xy + flows.backward) * 2.0 - 1.0  # (b, f-1, h, w, 2)
        c = features.shape[2]
        flat_feats = earlier(features).reshape(b * (f - 1), c, h, w)
        flat_grid = grid.reshape(b * (f - 1), h, w, 2)
        if cfg.warp_impl in ("fused", "pallas"):
            from ...ops.pallas.warp_kernel import warp_features

            warped = warp_features(
                flat_feats,
                jax.lax.stop_gradient(flat_grid.astype(flat_feats.dtype)),
                cfg.warp_radius,
            )
        elif cfg.warp_impl == "matmul":
            from ...ops.warp import warp_bilinear_matmul

            warped = warp_bilinear_matmul(
                flat_feats, flat_grid.astype(flat_feats.dtype),
                radius=cfg.warp_radius,
            )
        else:
            warped = grid_sample_2d(flat_feats, flat_grid, padding_mode="zeros")
        mlp_params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype), params["corr_weighter"]
        )
        # The first MLP layer on concat([warped, later]) splits by linearity:
        # W @ [a; b] = W_a @ a + W_b @ b. Feeding the NCHW halves straight
        # into channel-contracting einsums skips materializing (and
        # transposing) the 2c-channel concat — ~2.7 GB of HBM round-trips at
        # reference scale.
        layer0 = mlp_params[0]
        w_a = layer0["kernel"][:c]
        w_b = layer0["kernel"][c:]
        later_feats = later(features).reshape(b * (f - 1), c, h, w)
        x = (
            jnp.einsum("nchw,ck->nhwk", warped, w_a)
            + jnp.einsum("nchw,ck->nhwk", later_feats, w_b)
            + layer0["bias"]
        )
        x = jax.nn.relu(x)
        logits = _apply_weight_mlp(mlp_params[1:], x).astype(jnp.float32)
        logits = logits.reshape(b, f - 1, h, w, 1)
        weights = jnp.clip(jax.nn.sigmoid(logits)[..., 0], min=1e-4)
    else:
        weights = jax.nn.sigmoid(cfg.weight_sensitivity * params["weights"])[None]

    return BackboneOutput(depths=depths, weights=weights)
