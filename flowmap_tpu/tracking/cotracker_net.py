"""CoTracker (w8) sliding-window point tracker in JAX.

The reference's tracking supervision comes from `cotracker_w8` loaded via
torch.hub (`flowmap/tracking/track_predictor_cotracker.py:20-36`): query
points are tracked jointly through a video by iterating a factorized
time/track transformer over sliding windows of S=8 frames, with visibility
predicted from the refined per-track features. This module is a TPU-native
implementation of that architecture (CoTracker v1, Karaev et al. 2023, which
builds on PIPs' conv encoder + iterative refinement):

- **Feature CNN** (`fnet`): PIPs/RAFT-style residual encoder, instance norm,
  stride-4 output, 128 channels; multi-scale taps are resampled to stride 4
  and fused by a 3x3 conv.
- **Correlation features**: a 4-level average-pooled feature pyramid; each
  track samples a (2r+1)^2 = 49-point patch around its current estimate per
  level and correlates it with its own feature vector. TPU note: sampling
  patch *features* and then contracting with the track feature is the same
  linear algebra as building the full (N x H x W) correlation volume and
  bilinear-sampling it (both orders compute <f_track, F(p)> at the same
  interpolated positions) but never materializes the volume, and the patch
  sampling itself rides the separable one-hot-matmul sampler
  (`ops/grid_sample.py:grid_sample_points`) instead of a gather.
- **Update transformer** (`updateformer`): per-iteration tokens
  [flow embedding | correlations | track features] -> hidden, processed by
  `time_depth` attention blocks over the S window frames of each track,
  interleaved with `space_depth` attention blocks across tracks (joint
  tracking — the core CoTracker idea), then a linear head emits coordinate
  deltas and feature updates.
- **Sliding windows**: windows of S frames advance by S/2; each window is
  initialized from the previous one (overlap frames copied, new frames start
  at the last known position) — expressed as one `lax.scan` over windows so
  the transformer compiles exactly once regardless of video length.
- **Visibility**: a linear head on the final track features, after the
  window's refinement iterations.

Everything runs under a single jit with static shapes: videos are padded to
a whole number of windows by repeating the last frame (tracks are stationary
on the padding, which is then discarded).

Weights: the torch.hub checkpoint is not reachable in this environment; the
parameter tree mirrors the torch module tree of the public implementation
(see `convert_cotracker_state_dict`) so a real `cotracker_w8.pth` drops in.
Numerical correctness of the port is validated against an independent torch
replica of the same architecture (tests/torch_cotracker_replica.py), the
same oracle strategy used for GMFlow and RAFT.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jaxtyping import Array, Float

from ..ops.grid_sample import grid_sample_points


@dataclass(frozen=True)
class CoTrackerNetCfg:
    window_len: int = 8  # S; "w8"
    stride: int = 4
    latent_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    hidden_size: int = 384
    num_heads: int = 8
    time_depth: int = 6
    space_depth: int = 6
    iters: int = 4
    flow_emb_dim: int = 64  # sincos channels per coordinate

    @property
    def corr_dim(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2

    @property
    def token_dim(self) -> int:
        # [xy | sincos(x) | sincos(y)] + correlations + track features.
        return (2 * self.flow_emb_dim + 2) + self.corr_dim + self.latent_dim


# ---------------------------------------------------------------------------
# Primitives (NHWC convs, explicit param dicts mirroring the torch tree)
# ---------------------------------------------------------------------------


def _linear_init(key, din, dout, bias=True):
    std = (1.0 / din) ** 0.5  # torch nn.Linear default (uniform bound)
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.uniform(k1, (dout, din), minval=-std, maxval=std)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (dout,), minval=-std, maxval=std)
    return p


def _linear(p, x):
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def _conv_init(key, cin, cout, k, bias=True):
    fan_in = cin * k * k
    std = (1.0 / fan_in) ** 0.5
    k1, k2 = jax.random.split(key)
    p = {
        "weight": jax.random.uniform(
            k1, (k, k, cin, cout), minval=-std, maxval=std
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(k2, (cout,), minval=-std, maxval=std)
    return p


def _conv(p, x, stride=1):
    # Torch-style symmetric padding (k//2 both sides); XLA's "SAME" pads
    # asymmetrically under stride 2, which would shift sample centers.
    k = p["weight"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["weight"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _instance_norm(x, eps=1e-5):
    """InstanceNorm2d, affine=False (torch default) — per (n, c) over h, w."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _layer_norm(x, eps=1e-6):
    """LayerNorm, elementwise_affine=False (the DiT-style blocks)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _interp_bilinear_nhwc(x, out_hw):
    """Bilinear resize, align_corners=True, as two interp-matrix matmuls."""
    n, h, w, c = x.shape
    oh, ow = out_hw

    def mat(size_out, size_in):
        src = np.arange(size_out) * ((size_in - 1) / max(size_out - 1, 1))
        i0 = np.floor(src).astype(np.int64)
        i1 = np.minimum(i0 + 1, size_in - 1)
        t = src - i0
        m = np.zeros((size_out, size_in), np.float32)
        m[np.arange(size_out), i0] += 1 - t
        m[np.arange(size_out), i1] += t
        return jnp.asarray(m, dtype=x.dtype)

    x = jnp.einsum("Oh,nhwc->nOwc", mat(oh, h), x)
    return jnp.einsum("Ow,nhwc->nhOc", mat(ow, w), x)


# ---------------------------------------------------------------------------
# Feature encoder (fnet)
# ---------------------------------------------------------------------------

_ENC_PLANES = (64, 96, 128, 128)


def _resblock_init(key, cin, cout, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(k1, cin, cout, 3),
        "conv2": _conv_init(k2, cout, cout, 3),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = _conv_init(k3, cin, cout, 1)
    return p


def _resblock(p, x, stride):
    y = jax.nn.relu(_instance_norm(_conv(p["conv1"], x, stride=stride)))
    y = jax.nn.relu(_instance_norm(_conv(p["conv2"], y)))
    if "downsample" in p:
        x = _instance_norm(_conv(p["downsample"], x, stride=stride))
    return jax.nn.relu(x + y)


def _fnet_init(key, cfg: CoTrackerNetCfg):
    keys = jax.random.split(key, 16)
    p = {"conv1": _conv_init(keys[0], 3, 64, 7)}
    cin = 64
    for i, planes in enumerate(_ENC_PLANES):
        stride = 1 if i == 0 else 2
        p[f"layer{i + 1}"] = [
            _resblock_init(keys[1 + 2 * i], cin, planes, stride),
            _resblock_init(keys[2 + 2 * i], planes, planes, 1),
        ]
        cin = planes
    cat = sum(_ENC_PLANES)
    p["conv2"] = _conv_init(keys[9], cat, 2 * cfg.latent_dim, 3)
    p["conv3"] = _conv_init(keys[10], 2 * cfg.latent_dim, cfg.latent_dim, 1)
    return p


def _fnet(p, cfg: CoTrackerNetCfg, images_nhwc):
    """(n, h, w, 3) in [-1, 1] -> (n, h/stride, w/stride, latent)."""
    n, h, w, _ = images_nhwc.shape
    target = (h // cfg.stride, w // cfg.stride)
    x = jax.nn.relu(_instance_norm(_conv(p["conv1"], images_nhwc, stride=2)))
    taps = []
    for i in range(4):
        stride = 1 if i == 0 else 2
        blocks = p[f"layer{i + 1}"]
        x = _resblock(blocks[0], x, stride)
        x = _resblock(blocks[1], x, 1)
        taps.append(x)
    fused = jnp.concatenate(
        [_interp_bilinear_nhwc(t, target) for t in taps], axis=-1
    )
    x = _conv(p["conv2"], fused)
    x = jax.nn.relu(_instance_norm(x))
    return _conv(p["conv3"], x)


# ---------------------------------------------------------------------------
# Update transformer
# ---------------------------------------------------------------------------


def _attn_block_init(key, hidden, mlp_ratio=4.0):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mlp_hidden = int(hidden * mlp_ratio)
    return {
        "attn": {
            "qkv": _linear_init(k1, hidden, 3 * hidden),
            "proj": _linear_init(k2, hidden, hidden),
        },
        "mlp": {
            "fc1": _linear_init(k3, hidden, mlp_hidden),
            "fc2": _linear_init(k4, mlp_hidden, hidden),
        },
    }


def _attn_block(p, x, num_heads):
    """Pre-LN self-attention + MLP over axis -2 of (..., tokens, hidden)."""
    *lead, t, d = x.shape
    dh = d // num_heads
    qkv = _linear(p["attn"]["qkv"], _layer_norm(x))
    qkv = qkv.reshape(*lead, t, 3, num_heads, dh)
    q, k, v = (jnp.moveaxis(qkv[..., i, :, :], -2, -3) for i in range(3))
    logits = jnp.einsum("...qd,...kd->...qk", q, k) / math.sqrt(dh)
    attn = jax.nn.softmax(logits, axis=-1)
    y = jnp.einsum("...qk,...kd->...qd", attn, v)
    y = jnp.moveaxis(y, -3, -2).reshape(*lead, t, d)
    x = x + _linear(p["attn"]["proj"], y)
    h = _linear(p["mlp"]["fc1"], _layer_norm(x))
    x = x + _linear(p["mlp"]["fc2"], _gelu(h))
    return x


def _updateformer_init(key, cfg: CoTrackerNetCfg):
    keys = jax.random.split(key, 2 + cfg.time_depth + cfg.space_depth)
    return {
        "input_transform": _linear_init(keys[0], cfg.token_dim, cfg.hidden_size),
        "flow_head": _linear_init(keys[1], cfg.hidden_size, cfg.latent_dim + 2),
        "time_blocks": [
            _attn_block_init(keys[2 + i], cfg.hidden_size)
            for i in range(cfg.time_depth)
        ],
        "space_blocks": [
            _attn_block_init(keys[2 + cfg.time_depth + i], cfg.hidden_size)
            for i in range(cfg.space_depth)
        ],
    }


def _updateformer(p, cfg: CoTrackerNetCfg, tokens):
    """(n_tracks, s, token_dim) -> (n_tracks, s, latent + 2)."""
    x = _linear(p["input_transform"], tokens)
    every = max(cfg.time_depth // max(cfg.space_depth, 1), 1)
    j = 0
    for i, tb in enumerate(p["time_blocks"]):
        x = _attn_block(tb, x, cfg.num_heads)  # attention over the window
        if cfg.space_depth and i % every == 0 and j < cfg.space_depth:
            x = jnp.swapaxes(x, 0, 1)  # (s, n, hidden): attention over tracks
            x = _attn_block(p["space_blocks"][j], x, cfg.num_heads)
            x = jnp.swapaxes(x, 0, 1)
            j += 1
    return _linear(p["flow_head"], x)


def cotracker_init(key, cfg: CoTrackerNetCfg = CoTrackerNetCfg()) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "fnet": _fnet_init(k1, cfg),
        "updateformer": _updateformer_init(k2, cfg),
        # GroupNorm(1, latent) over the feature-update channel (affine).
        "norm": {
            "weight": jnp.ones((cfg.latent_dim,)),
            "bias": jnp.zeros((cfg.latent_dim,)),
        },
        "ffeat_updater": _linear_init(k4, cfg.latent_dim, cfg.latent_dim),
        "vis_predictor": _linear_init(k5, cfg.latent_dim, 1),
    }


# ---------------------------------------------------------------------------
# Correlation sampling
# ---------------------------------------------------------------------------


def _corr_pyramid(fmaps, levels):
    """(s, h, w, c) -> list of (s, h/2^l, w/2^l, c) average-pooled maps."""
    out = [fmaps]
    for _ in range(levels - 1):
        x = out[-1]
        s, h, w, c = x.shape
        x = x.reshape(s, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
        out.append(x)
    return out


def _sample_corrs(pyramid, coords, ffeats, radius):
    """Correlation patch features.

    coords: (s, n, 2) in stride-4 feature pixels; ffeats: (s, n, c).
    Returns (s, n, levels * (2r+1)^2).
    """
    s, n, c = ffeats.shape
    k = 2 * radius + 1
    d = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-radius, radius + 1, dtype=jnp.float32),
            jnp.arange(-radius, radius + 1, dtype=jnp.float32),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(k * k, 2)

    outs = []
    for level, fmap in enumerate(pyramid):
        _, hl, wl, _ = fmap.shape
        centers = coords / (2.0**level)
        pts = centers[:, :, None, :] + d[None, None]  # (s, n, k*k, 2)
        # grid_sample_points convention: normalized xy with x_pix = x*w - 0.5.
        norm = (pts + 0.5) / jnp.asarray([wl, hl], pts.dtype)
        sampled = grid_sample_points(
            fmap.transpose(0, 3, 1, 2),
            norm.reshape(s, n * k * k, 2),
            padding_mode="zeros",
        )  # (s, c, n*k*k)
        patches = sampled.reshape(s, c, n, k * k)
        corr = jnp.einsum("snc,scnk->snk", ffeats, patches) / math.sqrt(c)
        outs.append(corr)
    return jnp.concatenate(outs, axis=-1)


def _embed_2d(xy, channels):
    """[xy | sincos(x) | sincos(y)] positional embedding (PIPs-style)."""
    freq = jnp.arange(0, channels, 2, dtype=jnp.float32) * (1000.0 / channels)
    x = xy[..., 0:1] * freq
    y = xy[..., 1:2] * freq
    pe_x = jnp.stack([jnp.sin(x), jnp.cos(x)], axis=-1).reshape(
        *xy.shape[:-1], channels
    )
    pe_y = jnp.stack([jnp.sin(y), jnp.cos(y)], axis=-1).reshape(
        *xy.shape[:-1], channels
    )
    return jnp.concatenate([xy, pe_x, pe_y], axis=-1)


# ---------------------------------------------------------------------------
# Window refinement + sliding-window tracking
# ---------------------------------------------------------------------------


def _window_forward(params, cfg: CoTrackerNetCfg, fmaps, coords, ffeats):
    """Iteratively refine one window.

    fmaps: (s, h4, w4, c); coords: (s, n, 2) feature pixels; ffeats: (s, n, c).
    Returns (coords, vis_logits, ffeats).
    """
    pyramid = _corr_pyramid(fmaps, cfg.corr_levels)

    def body(carry, _):
        coords, ffeats = carry
        corrs = _sample_corrs(pyramid, coords, ffeats, cfg.corr_radius)
        disp = coords - coords[0:1]
        emb = _embed_2d(disp, cfg.flow_emb_dim)
        tokens = jnp.concatenate([emb, corrs, ffeats], axis=-1)
        out = _updateformer(
            params["updateformer"], cfg, jnp.swapaxes(tokens, 0, 1)
        )
        out = jnp.swapaxes(out, 0, 1)  # (s, n, latent + 2)
        coords = coords + out[..., :2]
        delta_f = out[..., 2:]
        gn = params["norm"]
        delta_f = _layer_norm(delta_f, eps=1e-5) * gn["weight"] + gn["bias"]
        # nn.GELU() in the torch tree is the exact (erf) variant.
        ffeats = ffeats + jax.nn.gelu(
            _linear(params["ffeat_updater"], delta_f), approximate=False
        )
        return (coords, ffeats), None

    (coords, ffeats), _ = jax.lax.scan(
        body, (coords, ffeats), None, length=cfg.iters
    )
    vis = _linear(params["vis_predictor"], ffeats)[..., 0]
    return coords, vis, ffeats


def _num_windows(num_frames: int, s: int) -> int:
    h = s // 2
    return max(1, -(-(max(num_frames, s) - s) // h) + 1)


@functools.partial(jax.jit, static_argnames=("cfg", "num_frames"))
def _track_one_direction(params, cfg: CoTrackerNetCfg, video, queries, num_frames):
    """Track `queries` (given at frame 0) through `video`.

    video: (f, 3, h, w) in [0, 1]; queries: (n, 2) normalized [0, 1].
    Returns (xy (f, n, 2) normalized, vis_logits (f, n)).
    """
    f, _, h, w = video.shape
    s = cfg.window_len
    hop = s // 2
    nw = _num_windows(num_frames, s)
    pad = (nw - 1) * hop + s - f

    images = jnp.transpose(video, (0, 2, 3, 1)) * 2.0 - 1.0
    if pad:
        images = jnp.concatenate(
            [images, jnp.repeat(images[-1:], pad, axis=0)], axis=0
        )
    fmaps = _fnet(params["fnet"], cfg, images)  # (f + pad, h4, w4, c)

    wh = jnp.asarray([w, h], jnp.float32)
    coords0 = queries * wh / cfg.stride  # feature pixels
    n = queries.shape[0]
    feats0 = grid_sample_points(
        fmaps[0:1].transpose(0, 3, 1, 2),
        (coords0[None] + 0.5)
        / jnp.asarray([fmaps.shape[2], fmaps.shape[1]], jnp.float32),
        padding_mode="zeros",
    )[0].T  # (n, c)

    init_coords = jnp.broadcast_to(coords0, (s, n, 2))
    init_ffeats = jnp.broadcast_to(feats0, (s, n, cfg.latent_dim))

    def window_body(carry, start):
        coords_prev, ffeats_prev = carry
        fwin = jax.lax.dynamic_slice_in_dim(fmaps, start, s, axis=0)
        coords, vis, ffeats = _window_forward(
            params, cfg, fwin, coords_prev, ffeats_prev
        )
        # Next window: shift by hop, new frames start at the last estimate.
        nxt_c = jnp.concatenate(
            [coords[hop:], jnp.broadcast_to(coords[-1], (hop, n, 2))], axis=0
        )
        nxt_f = jnp.concatenate(
            [
                ffeats[hop:],
                jnp.broadcast_to(ffeats[-1], (hop, n, cfg.latent_dim)),
            ],
            axis=0,
        )
        return (nxt_c, nxt_f), (coords, vis)

    starts = jnp.arange(nw) * hop
    _, (all_coords, all_vis) = jax.lax.scan(
        window_body, (init_coords, init_ffeats), starts
    )

    # Assemble the timeline; later windows overwrite the overlap (the v1
    # semantics — later windows have seen more context).
    total = (nw - 1) * hop + s
    xy = jnp.zeros((total, n, 2), jnp.float32)
    vis = jnp.zeros((total, n), jnp.float32)
    for wi in range(nw):
        st = wi * hop
        xy = jax.lax.dynamic_update_slice_in_dim(xy, all_coords[wi], st, 0)
        vis = jax.lax.dynamic_update_slice_in_dim(vis, all_vis[wi], st, 0)
    xy = xy[:f] * cfg.stride / wh  # back to normalized image coordinates
    return xy, vis[:f]


def track_points(
    params: dict,
    cfg: CoTrackerNetCfg,
    video: Float[Array, "f 3 h w"],
    queries: Float[Array, "n 2"],
    query_frame: int,
) -> tuple[Float[Array, "f n 2"], Float[Array, "f n"]]:
    """Bidirectional tracking from `query_frame` (backward_tracking=True).

    Frames >= query_frame come from a forward pass on video[query_frame:];
    frames <= query_frame from a pass on the time-reversed prefix — the
    reference's `backward_tracking=True` call
    (`track_predictor_cotracker.py:32-37`).
    Returns normalized xy and visibility LOGITS per frame.
    """
    f = video.shape[0]
    xy_f, vis_f = _track_one_direction(
        params, cfg, video[query_frame:], queries, f - query_frame
    )
    if query_frame == 0:
        return xy_f, vis_f
    xy_b, vis_b = _track_one_direction(
        params, cfg, video[: query_frame + 1][::-1], queries, query_frame + 1
    )
    xy = jnp.concatenate([xy_b[1:][::-1], xy_f], axis=0)
    vis = jnp.concatenate([vis_b[1:][::-1], vis_f], axis=0)
    return xy, vis


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------


def convert_cotracker_state_dict(
    state_dict: dict, cfg: CoTrackerNetCfg = CoTrackerNetCfg()
) -> dict:
    """Map a torch CoTracker state_dict onto the JAX parameter tree.

    Key schema (the public implementation's module tree; `model.` prefixes
    are stripped): `fnet.conv1|layer{1..4}.{0,1}.conv1/conv2/downsample.0`,
    `fnet.conv2/conv3`, `updateformer.input_transform|flow_head`,
    `updateformer.time_blocks.{i}.attn.qkv/attn.proj/mlp.fc1/mlp.fc2`,
    `updateformer.space_blocks.{i}...`, `norm`, `ffeat_updater.0`,
    `vis_predictor.0`. Conv weights transpose OIHW -> HWIO; linear weights
    stay (out, in).
    """

    sd = {
        (k[len("model.") :] if k.startswith("model.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }

    def conv(prefix):
        p = {"weight": jnp.asarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def linear(prefix):
        p = {"weight": jnp.asarray(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def resblock(prefix):
        p = {"conv1": conv(f"{prefix}.conv1"), "conv2": conv(f"{prefix}.conv2")}
        if f"{prefix}.downsample.0.weight" in sd:
            p["downsample"] = conv(f"{prefix}.downsample.0")
        return p

    fnet = {"conv1": conv("fnet.conv1")}
    for i in range(4):
        fnet[f"layer{i + 1}"] = [
            resblock(f"fnet.layer{i + 1}.{j}") for j in range(2)
        ]
    fnet["conv2"] = conv("fnet.conv2")
    fnet["conv3"] = conv("fnet.conv3")

    def attn_block(prefix):
        return {
            "attn": {
                "qkv": linear(f"{prefix}.attn.qkv"),
                "proj": linear(f"{prefix}.attn.proj"),
            },
            "mlp": {
                "fc1": linear(f"{prefix}.mlp.fc1"),
                "fc2": linear(f"{prefix}.mlp.fc2"),
            },
        }

    updateformer = {
        "input_transform": linear("updateformer.input_transform"),
        "flow_head": linear("updateformer.flow_head"),
        "time_blocks": [
            attn_block(f"updateformer.time_blocks.{i}")
            for i in range(cfg.time_depth)
        ],
        "space_blocks": [
            attn_block(f"updateformer.space_blocks.{i}")
            for i in range(cfg.space_depth)
        ],
    }

    return {
        "fnet": fnet,
        "updateformer": updateformer,
        "norm": {
            "weight": jnp.asarray(sd["norm.weight"]),
            "bias": jnp.asarray(sd["norm.bias"]),
        },
        "ffeat_updater": linear("ffeat_updater.0"),
        "vis_predictor": linear("vis_predictor.0"),
    }
