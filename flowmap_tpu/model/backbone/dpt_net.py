"""DPT-Large monocular depth network (ViT-L/16 + DPT decoder) in JAX.

The reference's second MiDaS variant (`backbone_midas.py:37-41`,
`model: DPT_Large` with 256-channel penultimate features). Architecture per
"Vision Transformers for Dense Prediction" (Ranftl et al., ICCV 2021) and the
isl-org/MiDaS DPT implementation:

- ViT-L/16 encoder: 16x16 patch embed (1024 dim), learned position embeddings
  (bilinearly resized for non-384 inputs), class token, 24 pre-norm
  transformer blocks (16 heads, MLP ratio 4, GELU).
- Tokens tapped after blocks {5, 11, 17, 23}; class token folded in by the
  "project" readout (concat + linear + GELU).
- Reassemble: 1x1 conv to {256, 512, 1024, 1024} channels, then resample to
  strides {4, 8, 16, 32} (transposed conv x4 / x2, identity, stride-2 conv).
- Scratch: 3x3 projections to 256 + 4 RefineNet fusion blocks (same
  structure as the small variant but constant 256 channels, i.e. expand=False).
- Head: 3x3 conv 256->128, x2 upsample, 3x3 conv 128->32, ReLU, 1x1 conv
  32->1, ReLU (dropped for the "exp" mapping).

Parameters live in a nested dict mirroring the module tree; the converter for
the torch-hub `dpt_large_384.pt` checkpoint follows the same key scheme as
`utils/torch_convert.py`.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

EMBED_DIM = 1024
NUM_LAYERS = 24
NUM_HEADS = 16
PATCH = 16
TAP_LAYERS = (5, 11, 17, 23)
REASSEMBLE_CHANNELS = (256, 512, 1024, 1024)
FEATURES = 256
POS_GRID = 24  # 384 / 16 training grid


def _linear_init(key, cin, cout, std=0.02):
    k1, _ = jax.random.split(key)
    return {
        "kernel": std * jax.random.normal(k1, (cin, cout)),
        "bias": jnp.zeros((cout,)),
    }


def _conv_init(key, cin, cout, k, bias=True):
    fan_in = cin * k * k
    std = (2.0 / fan_in) ** 0.5
    p = {"kernel": std * jax.random.normal(key, (k, k, cin, cout))}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def _conv(x, p, stride=1, padding=None):
    k = p["kernel"].shape[0]
    pad = k // 2 if padding is None else padding
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"],
        (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _conv_transpose(x, p, stride):
    y = jax.lax.conv_transpose(
        x,
        p["kernel"],
        (stride, stride),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layer_norm(x, p, eps=1e-6):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _attention(x, p):
    n, l, c = x.shape
    qkv = x @ p["qkv"]["kernel"] + p["qkv"]["bias"]  # (n, l, 3c)
    qkv = qkv.reshape(n, l, 3, NUM_HEADS, c // NUM_HEADS)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (c // NUM_HEADS) ** -0.5
    attn = jax.nn.softmax(
        jnp.einsum("nlhd,nmhd->nhlm", q * scale, k), axis=-1
    )
    out = jnp.einsum("nhlm,nmhd->nlhd", attn, v).reshape(n, l, c)
    return out @ p["proj"]["kernel"] + p["proj"]["bias"]


def _block(x, p):
    y = _layer_norm(x, p["norm1"])
    x = x + _attention(y, p["attn"])
    y = _layer_norm(x, p["norm2"])
    y = jax.nn.gelu(y @ p["mlp1"]["kernel"] + p["mlp1"]["bias"], approximate=False)
    return x + (y @ p["mlp2"]["kernel"] + p["mlp2"]["bias"])


def _resize_pos_embed(pos: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """(1, 1 + POS_GRID^2, c) -> (1, 1 + gh*gw, c), bilinear on the grid."""
    cls, grid = pos[:, :1], pos[:, 1:]
    c = grid.shape[-1]
    grid = grid.reshape(1, POS_GRID, POS_GRID, c)
    grid = jax.image.resize(grid, (1, gh, gw, c), "bilinear")
    return jnp.concatenate([cls, grid.reshape(1, gh * gw, c)], axis=1)


def dpt_large_init(key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 200))
    p: dict = {
        "patch_embed": _conv_init(next(keys), 3, EMBED_DIM, PATCH),
        "cls_token": jnp.zeros((1, 1, EMBED_DIM)),
        "pos_embed": 0.02
        * jax.random.normal(next(keys), (1, 1 + POS_GRID * POS_GRID, EMBED_DIM)),
        "blocks": [],
    }
    for _ in range(NUM_LAYERS):
        p["blocks"].append(
            {
                "norm1": {"weight": jnp.ones((EMBED_DIM,)), "bias": jnp.zeros((EMBED_DIM,))},
                "attn": {
                    "qkv": _linear_init(next(keys), EMBED_DIM, 3 * EMBED_DIM),
                    "proj": _linear_init(next(keys), EMBED_DIM, EMBED_DIM),
                },
                "norm2": {"weight": jnp.ones((EMBED_DIM,)), "bias": jnp.zeros((EMBED_DIM,))},
                "mlp1": _linear_init(next(keys), EMBED_DIM, 4 * EMBED_DIM),
                "mlp2": _linear_init(next(keys), 4 * EMBED_DIM, EMBED_DIM),
            }
        )
    # Readout projections (concat cls + token -> dim).
    p["readout"] = [
        _linear_init(next(keys), 2 * EMBED_DIM, EMBED_DIM) for _ in TAP_LAYERS
    ]
    # Reassemble: 1x1 projection + resampling convs.
    p["reassemble"] = []
    for i, c in enumerate(REASSEMBLE_CHANNELS):
        entry = {"project": _conv_init(next(keys), EMBED_DIM, c, 1)}
        if i == 0:
            entry["resample"] = _conv_init(next(keys), c, c, 4)  # x4 deconv
        elif i == 1:
            entry["resample"] = _conv_init(next(keys), c, c, 2)  # x2 deconv
        elif i == 3:
            entry["resample"] = _conv_init(next(keys), c, c, 3)  # /2 conv
        p["reassemble"].append(entry)
    p["scratch"] = {
        f"layer{i + 1}_rn": _conv_init(
            next(keys), REASSEMBLE_CHANNELS[i], FEATURES, 3, bias=False
        )
        for i in range(4)
    }

    def rcu():
        return {
            "conv1": _conv_init(next(keys), FEATURES, FEATURES, 3),
            "conv2": _conv_init(next(keys), FEATURES, FEATURES, 3),
        }

    for i in range(1, 5):
        p[f"refinenet{i}"] = {
            "rcu1": rcu(),
            "rcu2": rcu(),
            "out_conv": _conv_init(next(keys), FEATURES, FEATURES, 1),
        }
    p["head"] = {
        "conv1": _conv_init(next(keys), FEATURES, FEATURES // 2, 3),
        "conv2": _conv_init(next(keys), FEATURES // 2, 32, 3),
        "conv3": _conv_init(next(keys), 32, 1, 1),
    }
    return p


def _rcu(p, x):
    y = _conv(jax.nn.relu(x), p["conv1"])
    y = _conv(jax.nn.relu(y), p["conv2"])
    return x + y


def _upsample2x(x):
    # align_corners=True x2 (the DPT fusion blocks' torch Interpolate mode).
    from .midas_net import _upsample2x as _up_ac

    return _up_ac(x, align_corners=True)


def _fusion(p, x, skip=None):
    if skip is not None:
        x = x + _rcu(p["rcu1"], skip)
    x = _rcu(p["rcu2"], x)
    x = _upsample2x(x)
    return _conv(x, p["out_conv"])


class DptLarge:
    """Functional DPT-Large forward (mirrors MidasSmall.apply_split)."""

    @staticmethod
    def apply_split(
        params: dict,
        images_nchw,
        mapping: Literal["original", "exp"] = "original",
    ):
        x = jnp.transpose(images_nchw, (0, 2, 3, 1))
        n, h, w, _ = x.shape
        gh, gw = h // PATCH, w // PATCH

        tokens = _conv(x, params["patch_embed"], stride=PATCH, padding=0)
        tokens = tokens.reshape(n, gh * gw, EMBED_DIM)
        cls = jnp.broadcast_to(params["cls_token"], (n, 1, EMBED_DIM))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + _resize_pos_embed(params["pos_embed"], gh, gw)

        taps = []
        for i, block in enumerate(params["blocks"]):
            tokens = _block(tokens, block)
            if i in TAP_LAYERS:
                taps.append(tokens)

        maps = []
        for tap, readout, reassemble in zip(
            taps, params["readout"], params["reassemble"]
        ):
            cls_tok = jnp.broadcast_to(tap[:, :1], tap[:, 1:].shape)
            merged = jnp.concatenate([tap[:, 1:], cls_tok], axis=-1)
            merged = jax.nn.gelu(
                merged @ readout["kernel"] + readout["bias"], approximate=False
            )
            fmap = merged.reshape(n, gh, gw, EMBED_DIM)
            fmap = _conv(fmap, reassemble["project"], padding=0)
            if "resample" in reassemble:
                k = reassemble["resample"]["kernel"].shape[0]
                if k == 4:
                    fmap = _conv_transpose(fmap, reassemble["resample"], 4)
                elif k == 2:
                    fmap = _conv_transpose(fmap, reassemble["resample"], 2)
                else:
                    fmap = _conv(fmap, reassemble["resample"], stride=2)
            maps.append(fmap)

        s = params["scratch"]
        l1 = _conv(maps[0], s["layer1_rn"])  # /4
        l2 = _conv(maps[1], s["layer2_rn"])  # /8
        l3 = _conv(maps[2], s["layer3_rn"])  # /16
        l4 = _conv(maps[3], s["layer4_rn"])  # /32
        path4 = _fusion(params["refinenet4"], l4)
        path3 = _fusion(params["refinenet3"], path4, l3)
        path2 = _fusion(params["refinenet2"], path3, l2)
        path1 = _fusion(params["refinenet1"], path2, l1)  # (n, h/2, w/2, 256)

        hp = params["head"]
        y = _conv(path1, hp["conv1"])
        y = _upsample2x(y)
        y = jax.nn.relu(_conv(y, hp["conv2"]))
        y = _conv(y, hp["conv3"])
        if mapping == "original":
            y = jax.nn.relu(y)

        features = jnp.transpose(path1, (0, 3, 1, 2))
        return y[..., 0], features
