"""GMFlow (scale-1, swin attention, global matching) in JAX.

Architecture-faithful port of the vendored reference GMFlow
(`flowmap/third_party/gmflow/gmflow/*.py`, used frozen by
`flowmap/flow/flow_predictor_gmflow.py:51-59` with feature_channels=128,
num_scales=1, attn_splits=2, global correlation, global propagation):

- CNN encoder: 7x7/2 conv + InstanceNorm/ReLU, residual stages (64@/2,
  96@/4, 128@/8), 1x1 to 128 channels.
- Feature transformer: 6 blocks of (windowed self-attn without FFN) +
  (windowed cross-attn + FFN), swin 2x2 splits, shifted on odd layers with
  the standard attention mask, sine position encoding added per window.
- Global correlation softmax: the (HW x HW) feature matmul + softmax +
  expected-coordinates — one big MXU matmul chain (the op SURVEY.md §2.4
  flags as the natural fused-kernel target).
- Flow propagation: global self-attention with flow as values.
- Convex upsampling x8: 9-neighbor softmax-weighted unfold.

Parameters are a FLAT dict keyed by the torch state_dict names (e.g.
"backbone.layer1.0.conv1.weight"), with arrays already in JAX layout
(HWIO convs, (in, out) linears). `convert_torch_state_dict` maps the public
gmflow_sintel/mixdata checkpoint 1:1; `init_params` gives a random-but-sane
initialization for tests.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jaxtyping import Array, Float

FEATURE_CHANNELS = 128
NUM_LAYERS = 6
ATTN_SPLITS = 2
UPSAMPLE_FACTOR = 8

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# Primitives (NHWC)
# ---------------------------------------------------------------------------


def _conv(x, w, b=None, stride=1):
    # torch-style symmetric padding (k//2 on each side) — NOT XLA "SAME",
    # whose asymmetric padding misaligns strided convs with the checkpoint.
    # Mixed dtypes can occur under the bf16 compute knob where an f32 value
    # (e.g. the kernel-produced flow) re-enters a conv; promote the weights.
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
        b = None if b is None else b.astype(x.dtype)
    k = w.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b
    return y


def _instance_norm(x, eps=1e-5):
    """torch InstanceNorm2d default: no affine params, per-instance stats.

    Single-pass moments (E[x^2] - E[x]^2, accumulated in f32) instead of
    two-pass jnp.var: XLA emits both reductions in one multi-output fusion
    reading x once. The cancellation error of the shifted form is benign
    here: post-conv activations are O(1-10) and the f32 accumulator keeps
    ~1e-6 relative — far under the net's bf16 activation noise."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    meansq = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
    var = jnp.maximum(meansq - mean * mean, 0.0)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _layer_norm(x, weight, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


# ---------------------------------------------------------------------------
# CNN encoder
# ---------------------------------------------------------------------------


def _residual_block(p, prefix, x, stride):
    y = jax.nn.relu(_instance_norm(_conv(x, p[f"{prefix}.conv1.weight"], stride=stride)))
    y = jax.nn.relu(_instance_norm(_conv(y, p[f"{prefix}.conv2.weight"])))
    if f"{prefix}.downsample.0.weight" in p:
        x = _instance_norm(
            _conv(x, p[f"{prefix}.downsample.0.weight"],
                  p.get(f"{prefix}.downsample.0.bias"), stride=stride)
        )
    return jax.nn.relu(x + y)


def _encoder(p, x):
    x = jax.nn.relu(_instance_norm(_conv(x, p["backbone.conv1.weight"], stride=2)))
    x = _residual_block(p, "backbone.layer1.0", x, 1)
    x = _residual_block(p, "backbone.layer1.1", x, 1)
    x = _residual_block(p, "backbone.layer2.0", x, 2)
    x = _residual_block(p, "backbone.layer2.1", x, 1)
    x = _residual_block(p, "backbone.layer3.0", x, 2)
    x = _residual_block(p, "backbone.layer3.1", x, 1)
    return _conv(x, p["backbone.conv2.weight"], p["backbone.conv2.bias"])


# ---------------------------------------------------------------------------
# Swin attention machinery
# ---------------------------------------------------------------------------


def _split_windows(x: Float[Array, "b h w c"], k: int) -> Float[Array, "bkk hk wk c"]:
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b * k * k, h // k, w // k, c)


def _merge_windows(x: Float[Array, "bkk hk wk c"], k: int) -> Float[Array, "b h w c"]:
    bkk, hk, wk, c = x.shape
    b = bkk // (k * k)
    x = x.reshape(b, k, k, hk, wk, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, k * hk, k * wk, c)


def _position_embedding_sine(h: int, w: int, num_pos_feats: int = 64) -> np.ndarray:
    """Sine position encoding (h, w, 2*num_pos_feats), matching
    `gmflow/position.py` (cumsum-of-ones layout, y then x)."""
    temperature = 10000.0
    scale = 2 * math.pi
    eps = 1e-6
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x_embed = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    y_embed = y_embed / (h + eps) * scale
    x_embed = x_embed / (w + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], -1).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], -1).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1)  # (h, w, 2*num_pos_feats)


def _feature_add_position(f0, f1, k: int):
    b, h, w, c = f0.shape
    pos = jnp.asarray(_position_embedding_sine(h // k, w // k, c // 2), f0.dtype)
    f0s = _split_windows(f0, k) + pos
    f1s = _split_windows(f1, k) + pos
    return _merge_windows(f0s, k), _merge_windows(f1s, k)


def _shift_window_attn_mask(h: int, w: int, k: int) -> np.ndarray:
    """(K*K, L, L) additive mask for shifted-window attention
    (`transformer.py:19-44`)."""
    wh, ww = h // k, w // k
    sh, sw = wh // 2, ww // 2
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, h - wh), slice(h - wh, h - sh), slice(h - sh, h)):
        for ws in (slice(0, w - ww), slice(w - ww, w - sw), slice(w - sw, w)):
            img_mask[hs, ws] = cnt
            cnt += 1
    windows = (
        img_mask.reshape(k, wh, k, ww).transpose(0, 2, 1, 3).reshape(k * k, wh * ww)
    )
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(
    q, k_, v, num_splits: int, h: int, w: int,
    with_shift: bool, attn_mask: Optional[jnp.ndarray],
):
    """Single-head swin attention over (b, L, c) tensors
    (`transformer.py:47-105`)."""
    b, _, c = q.shape
    q = q.reshape(b, h, w, c)
    k_ = k_.reshape(b, h, w, c)
    v = v.reshape(b, h, w, c)

    if with_shift:
        sh, sw = (h // num_splits) // 2, (w // num_splits) // 2
        q = jnp.roll(q, (-sh, -sw), axis=(1, 2))
        k_ = jnp.roll(k_, (-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, (-sh, -sw), axis=(1, 2))

    qs = _split_windows(q, num_splits)
    ks = _split_windows(k_, num_splits)
    vs = _split_windows(v, num_splits)
    bkk, hk, wk, _ = qs.shape
    L = hk * wk
    # Fused softmax-attention kernel (the (L, L) probabilities never reach
    # HBM); the shifted-window mask rides in as the additive bias. The
    # kernel's scale is 1/sqrt(c) — identical to `scale` above. jnp
    # fallback off-TPU inside softmax_expectation.
    from ..ops.pallas import softmax_expectation

    bias = (
        jnp.tile(attn_mask, (b, 1, 1)).astype(jnp.float32)
        if with_shift
        else None
    )
    out = softmax_expectation(
        qs.reshape(bkk, L, c),
        ks.reshape(bkk, L, c),
        vs.reshape(bkk, L, c),
        bias=bias,
    ).astype(q.dtype)
    out = _merge_windows(out.reshape(bkk, hk, wk, c), num_splits)

    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out.reshape(b, h * w, c)


def _full_attention(q, k_, v):
    from ..ops.pallas import softmax_expectation

    return softmax_expectation(q, k_, v).astype(q.dtype)


def _transformer_layer(
    p, prefix, source, target, h, w, num_splits, with_shift, attn_mask, no_ffn
):
    """(`transformer.py:108-181`) — single-head attn + optional FFN."""
    query = source @ p[f"{prefix}.q_proj.weight"]
    key = target @ p[f"{prefix}.k_proj.weight"]
    value = target @ p[f"{prefix}.v_proj.weight"]

    if num_splits > 1:
        message = _window_attention(
            query, key, value, num_splits, h, w, with_shift, attn_mask
        )
    else:
        message = _full_attention(query, key, value)

    message = message @ p[f"{prefix}.merge.weight"]
    message = _layer_norm(
        message, p[f"{prefix}.norm1.weight"], p[f"{prefix}.norm1.bias"]
    )
    if not no_ffn:
        x = jnp.concatenate([source, message], axis=-1)
        x = x @ p[f"{prefix}.mlp.0.weight"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ p[f"{prefix}.mlp.2.weight"]
        message = _layer_norm(
            x, p[f"{prefix}.norm2.weight"], p[f"{prefix}.norm2.bias"]
        )
    return source + message


def _feature_transformer(p, f0, f1, num_splits: int):
    """6 self+cross blocks over concatenated batches (`transformer.py:184-291`)."""
    b, h, w, c = f0.shape
    attn_mask = (
        jnp.asarray(_shift_window_attn_mask(h, w, num_splits))
        if num_splits > 1
        else None
    )
    concat0 = jnp.concatenate([f0, f1], axis=0).reshape(2 * b, h * w, c)
    concat1 = jnp.concatenate([f1, f0], axis=0).reshape(2 * b, h * w, c)

    for i in range(NUM_LAYERS):
        with_shift = i % 2 == 1
        prefix = f"transformer.layers.{i}"
        concat0 = _transformer_layer(
            p, f"{prefix}.self_attn", concat0, concat0, h, w, num_splits,
            with_shift, attn_mask, no_ffn=True,
        )
        concat0 = _transformer_layer(
            p, f"{prefix}.cross_attn_ffn", concat0, concat1, h, w, num_splits,
            with_shift, attn_mask, no_ffn=False,
        )
        half0, half1 = concat0[:b], concat0[b:]
        concat1 = jnp.concatenate([half1, half0], axis=0)

    f0 = concat0[:b].reshape(b, h, w, c)
    f1 = concat0[b:].reshape(b, h, w, c)
    return f0, f1


# ---------------------------------------------------------------------------
# Matching, propagation, upsampling
# ---------------------------------------------------------------------------


def _coords_grid(h: int, w: int) -> jnp.ndarray:
    """(h, w, 2) xy pixel-index grid (`geometry.py:5-21`)."""
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def global_correlation_softmax(f0: Float[Array, "b h w c"], f1):
    """Expected correspondence from global correlation (`matching.py:7-37`).

    Uses the fused Pallas softmax-expectation kernel on TPU (the (HW, HW)
    correlation volume never reaches HBM); jnp fallback elsewhere."""
    from ..ops.pallas import global_correlation_expectation

    b, h, w, c = f0.shape
    grid = _coords_grid(h, w).reshape(h * w, 2)
    correspondence = global_correlation_expectation(
        f0.reshape(b, h * w, c), f1.reshape(b, h * w, c), grid
    ).reshape(b, h, w, 2)
    return correspondence - _coords_grid(h, w)


def _flow_propagation(p, feature0: Float[Array, "b h w c"], flow):
    """Global self-attention with flow values (`transformer.py:294-345`,
    including the q_proj/k_proj composition quirk preserved verbatim).

    Fused through the same softmax-expectation kernel as the global
    correlation — the (L, L) attention scores never reach HBM."""
    from ..ops.pallas import softmax_expectation

    b, h, w, c = feature0.shape
    query = feature0.reshape(b, h * w, c)
    query = query @ p["feature_flow_attn.q_proj.weight"] + p["feature_flow_attn.q_proj.bias"]
    key = query @ p["feature_flow_attn.k_proj.weight"] + p["feature_flow_attn.k_proj.bias"]
    value = flow.reshape(b, h * w, 2).astype(jnp.float32)
    out = softmax_expectation(query, key, value)
    return out.reshape(b, h, w, 2)


def _upsample_flow_convex(p, flow: Float[Array, "b h w 2"], feature):
    """Convex x8 upsampling (`gmflow.py:72-92`), lane-dense formulation.

    Same math as `softmax(mask.reshape(..., 9, k, k), axis=3)` einsummed
    against the unfolded neighborhoods — but that layout puts (k, k) on the
    (sublane, lane) tiles, wasting 120 of 128 lanes, and the K=9 einsum +
    unfold stack cost a measured ~70 ms/step at the pretrain shape
    (round-5 trace). Here the mask stays (b, h, w, 9*k*k) with its n-major
    channel order: group-softmax over the 9 stride-kk lane slices, then a
    convex combination of the 9 shifted coarse-flow slices — everything
    elementwise on (b, h, w, kk) tiles.
    """
    b, h, w, _ = flow.shape
    k = UPSAMPLE_FACTOR
    kk = k * k
    concat = jnp.concatenate([flow, feature], axis=-1)
    mask = jax.nn.relu(
        _conv(concat, p["upsampler.0.weight"], p["upsampler.0.bias"])
    )
    mask = _conv(mask, p["upsampler.2.weight"], p["upsampler.2.bias"])

    # Group softmax over n: channel index is n*kk + u*k + v, so the 9
    # logits of each output subpixel live in stride-kk lane slices.
    parts = [mask[..., n * kk : (n + 1) * kk] for n in range(9)]
    peak = parts[0]
    for q in parts[1:]:
        peak = jnp.maximum(peak, q)
    exps = [jnp.exp((q - peak).astype(jnp.float32)) for q in parts]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    inv = 1.0 / denom

    fk = (flow * k).astype(jnp.float32)
    planes = []
    for d in range(2):
        padded = jnp.pad(fk[..., d], ((0, 0), (1, 1), (1, 1)))
        acc = None
        for n, e in enumerate(exps):
            dy, dx = divmod(n, 3)
            shift = padded[:, dy : dy + h, dx : dx + w][..., None]
            term = e * shift
            acc = term if acc is None else acc + term
        up_d = acc * inv  # (b, h, w, kk): convex combination, (u, v) on lanes
        # Pixel shuffle: lane u*k+v -> row y*k+u, col x*k+v.
        rows = [
            up_d[..., u * k : (u + 1) * k].reshape(b, h, w * k)
            for u in range(k)
        ]
        planes.append(jnp.stack(rows, axis=2).reshape(b, h * k, w * k))
    return jnp.stack(planes, axis=-1)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def gmflow_forward(
    params: dict,
    img0: Float[Array, "b 3 h w"],
    img1: Float[Array, "b 3 h w"],
    compute_dtype=jnp.float32,
) -> Float[Array, "b h w 2"]:
    """Predict forward flow in PIXELS at full resolution.

    Inputs are [0, 255] images (the flowmap wrapper passes videos * 255,
    `flow_predictor_gmflow.py:73-76`); h and w must be divisible by 16.

    `compute_dtype=bfloat16` runs the frozen net MXU-native (params should be
    pre-cast to match); the flow output is always float32. Matmul
    accumulation stays f32 either way (TPU default / the fused correlation
    kernel's explicit acc dtype), so bf16 only rounds activations.
    """
    mean = jnp.asarray(_IMAGENET_MEAN * 255.0)
    std = jnp.asarray(_IMAGENET_STD * 255.0)
    x0 = (jnp.transpose(img0, (0, 2, 3, 1)) - mean) / std
    x1 = (jnp.transpose(img1, (0, 2, 3, 1)) - mean) / std

    both = jnp.concatenate([x0, x1], axis=0).astype(compute_dtype)
    features = _encoder(params, both)
    b = img0.shape[0]
    f0, f1 = features[:b], features[b:]

    f0, f1 = _feature_add_position(f0, f1, ATTN_SPLITS)
    f0, f1 = _feature_transformer(params, f0, f1, ATTN_SPLITS)

    flow = global_correlation_softmax(f0, f1)
    flow = _flow_propagation(params, f0, jax.lax.stop_gradient(flow))
    return _upsample_flow_convex(params, flow, f0).astype(jnp.float32)


class GMFlowPredictor:
    """Flow-predictor interface: (b, f, 3, h, w) videos -> normalized flow.

    Frame pairs are chunked (like the reference's RAFT `max_batch_size`,
    `flow_predictor_raft.py:34-45`): at flow resolution the swin attention
    scores for all pairs at once would not fit HBM."""

    def __init__(self, cfg) -> None:
        import functools

        checkpoint = getattr(cfg, "checkpoint", None)
        if checkpoint is not None:
            self.params = load_params(checkpoint)
        else:
            self.params = init_params(jax.random.PRNGKey(0))
        self.max_batch_size = getattr(cfg, "max_batch_size", 8)
        dtype = jnp.dtype(getattr(cfg, "compute_dtype", "float32"))
        self.compute_dtype = dtype
        if dtype != jnp.float32:
            self.params = jax.tree_util.tree_map(
                lambda x: x.astype(dtype), self.params
            )
        self._forward = jax.jit(
            functools.partial(gmflow_forward, compute_dtype=dtype)
        )

    def __call__(self, videos: Float[Array, "b f 3 h w"]) -> Float[Array, "b p h w 2"]:
        import jax.core

        b, f, c, h, w = videos.shape
        source = videos[:, :-1].reshape(b * (f - 1), c, h, w)
        target = videos[:, 1:].reshape(b * (f - 1), c, h, w)
        n = source.shape[0]
        traced = isinstance(videos, jax.core.Tracer)
        # Eager precompute keeps the FIXED chunk size: one compiled
        # (max_batch_size, ...) program serves every scene of a sweep
        # regardless of frame count. Inside a jit trace (pretrain's in-step
        # flow) the shape is fixed per trace anyway, so a smaller final
        # size just avoids padding work.
        size = min(self.max_batch_size, n) if traced else self.max_batch_size
        # Pad to a multiple of the chunk size so one compiled shape serves
        # every chunk.
        padded = -(-n // size) * size
        if padded != n:
            pad = padded - n
            reps = -(-pad // n)
            tile = jnp.concatenate([source] * reps, axis=0)[:pad]
            source = jnp.concatenate([source, tile], axis=0)
            tile_t = jnp.concatenate([target] * reps, axis=0)[:pad]
            target = jnp.concatenate([target, tile_t], axis=0)
        num_chunks = padded // size
        if not traced:
            # Eager chunk loop: reuses the single jitted chunk program.
            chunks = [
                self._forward(self.params, source[i : i + size] * 255.0,
                              target[i : i + size] * 255.0)
                for i in range(0, padded, size)
            ]
            flow = jnp.concatenate(chunks, axis=0)
        elif num_chunks == 1:
            flow = self._forward(self.params, source * 255.0, target * 255.0)
        else:
            # lax.map: ONE compiled chunk program scanned sequentially —
            # same HBM bound as the eager chunk loop, but the pretrain
            # step's in-jit flow graph contains a single GMFlow body
            # instead of num_chunks inlined copies (14x smaller graph /
            # compile at the reference pretrain shape).
            flow = jax.lax.map(
                lambda st: self._forward(self.params, st[0] * 255.0, st[1] * 255.0),
                (
                    source.reshape(num_chunks, size, c, h, w),
                    target.reshape(num_chunks, size, c, h, w),
                ),
            ).reshape(padded, h, w, 2)
        flow = flow[:n]
        wh = jnp.asarray([w, h], videos.dtype)
        return (flow / wh).reshape(b, f - 1, h, w, 2)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _param_spec() -> dict[str, tuple]:
    """name -> shape (JAX layout) for every parameter of the scale-1 model."""
    spec: dict[str, tuple] = {}

    def conv(name, cin, cout, k, bias=True):
        spec[f"{name}.weight"] = (k, k, cin, cout)
        if bias:
            spec[f"{name}.bias"] = (cout,)

    def res_block(name, cin, cout, downsample):
        conv(f"{name}.conv1", cin, cout, 3, bias=False)
        conv(f"{name}.conv2", cout, cout, 3, bias=False)
        if downsample:
            conv(f"{name}.downsample.0", cin, cout, 1, bias=True)

    conv("backbone.conv1", 3, 64, 7, bias=False)
    res_block("backbone.layer1.0", 64, 64, False)
    res_block("backbone.layer1.1", 64, 64, False)
    res_block("backbone.layer2.0", 64, 96, True)
    res_block("backbone.layer2.1", 96, 96, False)
    res_block("backbone.layer3.0", 96, 128, True)
    res_block("backbone.layer3.1", 128, 128, False)
    conv("backbone.conv2", 128, 128, 1, bias=True)

    c = FEATURE_CHANNELS
    for i in range(NUM_LAYERS):
        for sub, ffn in (("self_attn", False), ("cross_attn_ffn", True)):
            prefix = f"transformer.layers.{i}.{sub}"
            for proj in ("q_proj", "k_proj", "v_proj", "merge"):
                spec[f"{prefix}.{proj}.weight"] = (c, c)
            spec[f"{prefix}.norm1.weight"] = (c,)
            spec[f"{prefix}.norm1.bias"] = (c,)
            if ffn:
                spec[f"{prefix}.mlp.0.weight"] = (2 * c, 8 * c)
                spec[f"{prefix}.mlp.2.weight"] = (8 * c, c)
                spec[f"{prefix}.norm2.weight"] = (c,)
                spec[f"{prefix}.norm2.bias"] = (c,)

    spec["feature_flow_attn.q_proj.weight"] = (c, c)
    spec["feature_flow_attn.q_proj.bias"] = (c,)
    spec["feature_flow_attn.k_proj.weight"] = (c, c)
    spec["feature_flow_attn.k_proj.bias"] = (c,)

    conv("upsampler.0", 2 + c, 256, 3, bias=True)
    conv("upsampler.2", 256, UPSAMPLE_FACTOR**2 * 9, 1, bias=True)
    return spec


def init_params(key: jax.Array, dtype=jnp.float32) -> dict:
    """Random initialization (xavier for 2D+, zeros bias, ones norm-weight)."""
    params = {}
    for name, shape in _param_spec().items():
        key, sub = jax.random.split(key)
        if name.endswith(".bias") or (len(shape) == 1 and "norm" not in name):
            params[name] = jnp.zeros(shape, dtype)
        elif len(shape) == 1:
            params[name] = (
                jnp.ones(shape, dtype)
                if name.endswith("weight")
                else jnp.zeros(shape, dtype)
            )
        else:
            fan_in = int(np.prod(shape[:-1]))
            fan_out = shape[-1]
            bound = (6.0 / (fan_in + fan_out)) ** 0.5
            params[name] = jax.random.uniform(
                sub, shape, dtype, minval=-bound, maxval=bound
            )
    return params


def convert_torch_state_dict(state_dict: dict) -> dict:
    """Torch GMFlow checkpoint -> JAX param dict (layout transposes only)."""
    spec = _param_spec()
    params = {}
    for name, shape in spec.items():
        tensor = state_dict[name]
        array = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        if array.ndim == 4:  # OIHW -> HWIO
            array = array.transpose(2, 3, 1, 0)
        elif array.ndim == 2:  # (out, in) -> (in, out)
            array = array.T
        assert array.shape == shape, (name, array.shape, shape)
        params[name] = jnp.asarray(array)
    return params


def load_params(path) -> dict:
    """Load a converted (.npz) or torch (.pth) checkpoint."""
    import pathlib

    path = pathlib.Path(path)
    if path.suffix == ".npz":
        data = np.load(path)
        return {k: jnp.asarray(v) for k, v in data.items()}
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    weights = checkpoint.get("model", checkpoint)
    return convert_torch_state_dict(weights)
