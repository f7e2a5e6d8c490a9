"""RAFT optical flow (Teed & Zhao, ECCV 2020) in JAX.

The reference's default overfit flow predictor is torchvision's `raft_large`
(`flowmap/flow/flow_predictor_raft.py:24-57`, 32 update iterations, frozen).
This is an architecture-faithful port of canonical RAFT ("large"/BasicEncoder
configuration):

- fnet: instance-norm residual encoder -> 256ch features at 1/8.
- cnet: batch-norm residual encoder -> 128 hidden (tanh) + 128 context (relu).
- 4-level all-pairs correlation pyramid, radius-4 bilinear lookup.
- BasicMotionEncoder + SepConvGRU (1x5 then 5x1) update block, flow head,
  and mask head for 8x convex upsampling (mask logits scaled by 0.25).

Parameters: flat dict keyed by the princeton-vl/RAFT checkpoint names
(`fnet.*`, `cnet.*`, `update_block.*`); `convert_torch_state_dict` strips the
`module.` DataParallel prefix. torchvision's `raft_large` weights use a
different module naming scheme over the identical architecture; its key
rename is wired up in a follow-up once torchvision is available to validate
against (this environment ships torch without torchvision).

BatchNorm in cnet uses the checkpoint's running statistics (inference mode),
matching the frozen-predictor usage.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jaxtyping import Array, Float


NUM_LEVELS = 4
RADIUS = 4
HIDDEN = 128
CONTEXT = 128


def _conv(x, w, b=None, stride=1):
    k_h, k_w = w.shape[0], w.shape[1]
    pad = ((k_h // 2, k_h // 2), (k_w // 2, k_w // 2))
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if b is not None:
        y = y + b
    return y


def _instance_norm(x, weight=None, bias=None, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight + bias
    return y


def _batch_norm(x, p, prefix, eps=1e-5):
    """Inference-mode BN with running stats from the checkpoint."""
    mean = p[f"{prefix}.running_mean"]
    var = p[f"{prefix}.running_var"]
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p[f"{prefix}.weight"] + p[f"{prefix}.bias"]


def _norm(p, prefix, x, kind):
    if kind == "instance":
        # torch InstanceNorm2d(affine=False): no params stored.
        return _instance_norm(x)
    if kind == "batch":
        return _batch_norm(x, p, prefix)
    if kind == "none":
        return x
    raise ValueError(kind)


def _residual_block(p, prefix, x, stride, kind):
    y = jax.nn.relu(
        _norm(p, f"{prefix}.norm1", _conv(x, p[f"{prefix}.conv1.weight"],
                                          p.get(f"{prefix}.conv1.bias"),
                                          stride=stride), kind)
    )
    y = jax.nn.relu(
        _norm(p, f"{prefix}.norm2", _conv(y, p[f"{prefix}.conv2.weight"],
                                          p.get(f"{prefix}.conv2.bias")), kind)
    )
    if f"{prefix}.downsample.0.weight" in p:
        x = _norm(
            p,
            f"{prefix}.downsample.1",
            _conv(x, p[f"{prefix}.downsample.0.weight"],
                  p.get(f"{prefix}.downsample.0.bias"), stride=stride),
            kind,
        )
    return jax.nn.relu(x + y)


def _basic_encoder(p, prefix, x, kind):
    """BasicEncoder: 7x7/2 stem + 3 residual stages + 1x1 head -> 1/8 res."""
    x = jax.nn.relu(
        _norm(p, f"{prefix}.norm1",
              _conv(x, p[f"{prefix}.conv1.weight"], p.get(f"{prefix}.conv1.bias"),
                    stride=2), kind)
    )
    x = _residual_block(p, f"{prefix}.layer1.0", x, 1, kind)
    x = _residual_block(p, f"{prefix}.layer1.1", x, 1, kind)
    x = _residual_block(p, f"{prefix}.layer2.0", x, 2, kind)
    x = _residual_block(p, f"{prefix}.layer2.1", x, 1, kind)
    x = _residual_block(p, f"{prefix}.layer3.0", x, 2, kind)
    x = _residual_block(p, f"{prefix}.layer3.1", x, 1, kind)
    return _conv(x, p[f"{prefix}.conv2.weight"], p[f"{prefix}.conv2.bias"])


# ---------------------------------------------------------------------------
# Correlation pyramid
# ---------------------------------------------------------------------------


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _build_corr_pyramid(f0, f1):
    """All-pairs correlation -> NUM_LEVELS pooled volumes.

    corr[b, y1, x1, y2, x2] = <f0[y1,x1], f1[y2,x2]> / sqrt(c); stored as
    (b*h1*w1, h2/2^l, w2/2^l, 1)."""
    b, h, w, c = f0.shape
    corr = jnp.einsum("bxc,byc->bxy", f0.reshape(b, h * w, c), f1.reshape(b, h * w, c))
    corr = corr / jnp.sqrt(jnp.asarray(c, corr.dtype))
    volume = corr.reshape(b * h * w, h, w, 1)
    pyramid = [volume]
    for _ in range(NUM_LEVELS - 1):
        volume = _avg_pool2(volume)
        pyramid.append(volume)
    return pyramid


def _lookup_corr(pyramid, coords):
    """Sample (2R+1)^2 neighborhoods at `coords` (pixel units, level 0) from
    every pyramid level; returns (b, h, w, NUM_LEVELS*(2R+1)^2)."""
    b, h, w, _ = coords.shape
    r = RADIUS
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"), axis=-1)  # (2r+1,2r+1,2) in (dy,dx)
    delta = jnp.flip(delta, axis=-1)  # -> (dx, dy) to match xy coords
    out = []
    for level, volume in enumerate(pyramid):
        centroid = coords.reshape(b * h * w, 1, 1, 2) / (2.0**level)
        window = centroid + delta[None]
        hl, wl = volume.shape[1:3]
        # align_corners=True normalization (RAFT bilinear_sampler semantics).
        gx = 2.0 * window[..., 0] / max(wl - 1, 1) - 1.0
        gy = 2.0 * window[..., 1] / max(hl - 1, 1) - 1.0
        grid = jnp.stack([gx, gy], axis=-1)
        sampled = _grid_sample_align_corners(volume, grid)
        out.append(sampled.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)


def _grid_sample_align_corners(volume, grid):
    """Bilinear sample NHWC volume at [-1,1] grid, align_corners=True,
    zero padding."""
    n, h, w, c = volume.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        mask = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat = volume.reshape(n, h * w, c)
        idx = (yc * w + xc).reshape(n, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(*xi.shape, c)
        return vals * mask[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    tx = tx[..., None]
    ty = ty[..., None]
    return (v00 * (1 - tx) + v01 * tx) * (1 - ty) + (
        v10 * (1 - tx) + v11 * tx
    ) * ty


# ---------------------------------------------------------------------------
# Update block
# ---------------------------------------------------------------------------


def _motion_encoder(p, flow, corr):
    c = jax.nn.relu(_conv(corr, p["update_block.encoder.convc1.weight"],
                          p["update_block.encoder.convc1.bias"]))
    c = jax.nn.relu(_conv(c, p["update_block.encoder.convc2.weight"],
                          p["update_block.encoder.convc2.bias"]))
    f = jax.nn.relu(_conv(flow, p["update_block.encoder.convf1.weight"],
                          p["update_block.encoder.convf1.bias"]))
    f = jax.nn.relu(_conv(f, p["update_block.encoder.convf2.weight"],
                          p["update_block.encoder.convf2.bias"]))
    out = jax.nn.relu(
        _conv(jnp.concatenate([c, f], -1), p["update_block.encoder.conv.weight"],
              p["update_block.encoder.conv.bias"])
    )
    return jnp.concatenate([out, flow], -1)


def _sep_conv_gru(p, h, x):
    hx = jnp.concatenate([h, x], -1)
    z = jax.nn.sigmoid(_conv(hx, p["update_block.gru.convz1.weight"],
                             p["update_block.gru.convz1.bias"]))
    r = jax.nn.sigmoid(_conv(hx, p["update_block.gru.convr1.weight"],
                             p["update_block.gru.convr1.bias"]))
    q = jnp.tanh(_conv(jnp.concatenate([r * h, x], -1),
                       p["update_block.gru.convq1.weight"],
                       p["update_block.gru.convq1.bias"]))
    h = (1 - z) * h + z * q

    hx = jnp.concatenate([h, x], -1)
    z = jax.nn.sigmoid(_conv(hx, p["update_block.gru.convz2.weight"],
                             p["update_block.gru.convz2.bias"]))
    r = jax.nn.sigmoid(_conv(hx, p["update_block.gru.convr2.weight"],
                             p["update_block.gru.convr2.bias"]))
    q = jnp.tanh(_conv(jnp.concatenate([r * h, x], -1),
                       p["update_block.gru.convq2.weight"],
                       p["update_block.gru.convq2.bias"]))
    return (1 - z) * h + z * q


def _flow_head(p, h):
    x = jax.nn.relu(_conv(h, p["update_block.flow_head.conv1.weight"],
                          p["update_block.flow_head.conv1.bias"]))
    return _conv(x, p["update_block.flow_head.conv2.weight"],
                 p["update_block.flow_head.conv2.bias"])


def _upsample_mask(p, h):
    x = jax.nn.relu(_conv(h, p["update_block.mask.0.weight"],
                          p["update_block.mask.0.bias"]))
    return 0.25 * _conv(x, p["update_block.mask.2.weight"],
                        p["update_block.mask.2.bias"])


def _convex_upsample(flow, mask):
    """8x convex upsample (same machinery as GMFlow's)."""
    b, h, w, _ = flow.shape
    k = 8
    mask = mask.reshape(b, h, w, 9, k, k)
    mask = jax.nn.softmax(mask, axis=3)
    padded = jnp.pad(flow * k, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [padded[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=3,
    )
    up = jnp.einsum("bhwnuv,bhwnd->bhwuvd", mask, patches)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, 2)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def raft_forward(
    params: dict,
    img0: Float[Array, "b 3 h w"],
    img1: Float[Array, "b 3 h w"],
    num_iters: int = 32,
) -> Float[Array, "b h w 2"]:
    """Forward flow in pixels at full resolution. Images in [0, 1]; h, w
    divisible by 8. (RAFT normalizes to [-1, 1].)"""
    x0 = jnp.transpose(img0, (0, 2, 3, 1)) * 2.0 - 1.0
    x1 = jnp.transpose(img1, (0, 2, 3, 1)) * 2.0 - 1.0

    both = jnp.concatenate([x0, x1], axis=0)
    features = _basic_encoder(params, "fnet", both, "instance")
    b = img0.shape[0]
    f0, f1 = features[:b], features[b:]

    pyramid = _build_corr_pyramid(f0, f1)

    context = _basic_encoder(params, "cnet", x0, "batch")
    net = jnp.tanh(context[..., :HIDDEN])
    inp = jax.nn.relu(context[..., HIDDEN:])

    h8, w8 = f0.shape[1:3]
    ys, xs = jnp.meshgrid(
        jnp.arange(h8, dtype=jnp.float32),
        jnp.arange(w8, dtype=jnp.float32),
        indexing="ij",
    )
    coords0 = jnp.stack([xs, ys], axis=-1)[None].repeat(b, 0)

    def body(carry, _):
        net, coords1 = carry
        corr = _lookup_corr(pyramid, coords1)
        flow = coords1 - coords0
        motion = _motion_encoder(params, flow, corr)
        new_net = _sep_conv_gru(params, net, jnp.concatenate([inp, motion], -1))
        delta = _flow_head(params, new_net)
        return (new_net, coords1 + delta), None

    (net, coords1), _ = jax.lax.scan(body, (net, coords0), None, length=num_iters)

    mask = _upsample_mask(params, net)
    return _convex_upsample(coords1 - coords0, mask)


class RaftPredictor:
    """Flow-predictor interface: (b, f, 3, h, w) videos -> normalized flow.

    Chunks frame pairs by `max_batch_size` like the reference
    (`flow_predictor_raft.py:34-45`)."""

    def __init__(self, cfg) -> None:
        checkpoint = getattr(cfg, "checkpoint", None)
        if checkpoint is not None:
            self.params = load_params(checkpoint)
        else:
            self.params = init_params(jax.random.PRNGKey(0))
        self.num_iters = getattr(cfg, "num_flow_updates", 32)
        self.max_batch_size = getattr(cfg, "max_batch_size", 8)
        self._forward = jax.jit(raft_forward, static_argnames=("num_iters",))

    def __call__(self, videos: Float[Array, "b f 3 h w"]) -> Float[Array, "b p h w 2"]:
        b, f, c, h, w = videos.shape
        source = videos[:, :-1].reshape(b * (f - 1), c, h, w)
        target = videos[:, 1:].reshape(b * (f - 1), c, h, w)
        chunks = []
        for i in range(0, source.shape[0], self.max_batch_size):
            chunks.append(
                self._forward(
                    self.params,
                    source[i : i + self.max_batch_size],
                    target[i : i + self.max_batch_size],
                    num_iters=self.num_iters,
                )
            )
        flow = jnp.concatenate(chunks, axis=0)
        wh = jnp.asarray([w, h], videos.dtype)
        return (flow / wh).reshape(b, f - 1, h, w, 2)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _param_spec() -> dict[str, tuple]:
    spec: dict[str, tuple] = {}

    def conv(name, cin, cout, kh, kw=None, bias=True):
        kw = kh if kw is None else kw
        spec[f"{name}.weight"] = (kh, kw, cin, cout)
        if bias:
            spec[f"{name}.bias"] = (cout,)

    def bn(name, c):
        spec[f"{name}.weight"] = (c,)
        spec[f"{name}.bias"] = (c,)
        spec[f"{name}.running_mean"] = (c,)
        spec[f"{name}.running_var"] = (c,)

    def encoder(prefix, kind):
        conv(f"{prefix}.conv1", 3, 64, 7)
        if kind == "batch":
            bn(f"{prefix}.norm1", 64)
        dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for stage, (cin, cout, stride) in enumerate(dims, start=1):
            for block in range(2):
                name = f"{prefix}.layer{stage}.{block}"
                bcin = cin if block == 0 else cout
                bstride = stride if block == 0 else 1
                conv(f"{name}.conv1", bcin, cout, 3)
                conv(f"{name}.conv2", cout, cout, 3)
                if kind == "batch":
                    bn(f"{name}.norm1", cout)
                    bn(f"{name}.norm2", cout)
                if block == 0 and (stride != 1 or bcin != cout):
                    conv(f"{name}.downsample.0", bcin, cout, 1)
                    if kind == "batch":
                        bn(f"{name}.downsample.1", cout)
        conv(f"{prefix}.conv2", 128, 256, 1)

    encoder("fnet", "instance")
    encoder("cnet", "batch")

    corr_ch = NUM_LEVELS * (2 * RADIUS + 1) ** 2  # 324
    conv("update_block.encoder.convc1", corr_ch, 256, 1)
    conv("update_block.encoder.convc2", 256, 192, 3)
    conv("update_block.encoder.convf1", 2, 128, 7)
    conv("update_block.encoder.convf2", 128, 64, 3)
    conv("update_block.encoder.conv", 192 + 64, 128 - 2, 3)

    gru_in = HIDDEN + CONTEXT + 128  # hidden + (context, motion)
    for suffix, (kh, kw) in (("1", (1, 5)), ("2", (5, 1))):
        for gate in ("z", "r", "q"):
            conv(f"update_block.gru.conv{gate}{suffix}", gru_in, HIDDEN, kh, kw)

    conv("update_block.flow_head.conv1", HIDDEN, 256, 3)
    conv("update_block.flow_head.conv2", 256, 2, 3)
    conv("update_block.mask.0", HIDDEN, 256, 3)
    conv("update_block.mask.2", 256, 64 * 9, 1)
    return spec


def init_params(key: jax.Array, dtype=jnp.float32) -> dict:
    params = {}
    for name, shape in _param_spec().items():
        key, sub = jax.random.split(key)
        if name.endswith("running_mean"):
            params[name] = jnp.zeros(shape, dtype)
        elif name.endswith("running_var"):
            params[name] = jnp.ones(shape, dtype)
        elif len(shape) == 1:
            params[name] = (
                jnp.ones(shape, dtype) if name.endswith("weight") else jnp.zeros(shape, dtype)
            )
        else:
            fan_in = int(np.prod(shape[:-1]))
            std = (2.0 / fan_in) ** 0.5
            params[name] = std * jax.random.normal(sub, shape, dtype)
    return params


def convert_torch_state_dict(state_dict: dict) -> dict:
    """princeton-vl RAFT checkpoint -> JAX params (strips `module.`)."""
    spec = _param_spec()
    cleaned = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params = {}
    for name, shape in spec.items():
        tensor = cleaned[name]
        array = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor
        )
        if array.ndim == 4:  # OIHW -> HWIO
            array = array.transpose(2, 3, 1, 0)
        assert array.shape == shape, (name, array.shape, shape)
        params[name] = jnp.asarray(array)
    return params


def load_params(path) -> dict:
    import pathlib

    path = pathlib.Path(path)
    if path.suffix == ".npz":
        data = np.load(path)
        return {k: jnp.asarray(v) for k, v in data.items()}
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    return convert_torch_state_dict(checkpoint)


def _torchvision_key_to_princeton(key: str) -> str | None:
    """torchvision `raft_large` state_dict key -> princeton-vl key.

    torchvision (torchvision/models/optical_flow/raft.py) wraps the identical
    architecture in Conv2dNormActivation blocks: `feature_encoder` /
    `context_encoder` (fnet/cnet), `update_block.motion_encoder` (encoder),
    `update_block.recurrent_block.convgru{1,2}` (gru conv*{1,2}),
    `mask_predictor` (update_block.mask). Returns None for keys with no
    princeton counterpart (e.g. num_batches_tracked).
    """
    import re

    if "num_batches_tracked" in key:
        return None

    k = key
    for tv, pv in (("feature_encoder.", "fnet."), ("context_encoder.", "cnet.")):
        if k.startswith(tv):
            k = pv + k.removeprefix(tv)
            # Stem: convnormrelu.0 -> conv1, convnormrelu.1 -> norm1.
            k = k.replace(".convnormrelu.0.", ".conv1.")
            k = k.replace(".convnormrelu.1.", ".norm1.")
            # Residual blocks: convnormreluN.{0,1} -> convN / normN.
            k = re.sub(r"\.convnormrelu(\d)\.0\.", r".conv\1.", k)
            k = re.sub(r"\.convnormrelu(\d)\.1\.", r".norm\1.", k)
            # Head 1x1: .conv. -> .conv2. (but not conv1/conv2 block convs).
            k = re.sub(r"^(fnet|cnet)\.conv\.", r"\1.conv2.", k)
            return k

    if k.startswith("update_block.motion_encoder."):
        k = k.removeprefix("update_block.motion_encoder.")
        renames = {
            "convcorr1.0.": "convc1.",
            "convcorr2.0.": "convc2.",
            "convflow1.0.": "convf1.",
            "convflow2.0.": "convf2.",
            "conv.0.": "conv.",
        }
        for tv, pv in renames.items():
            if k.startswith(tv):
                return "update_block.encoder." + pv + k.removeprefix(tv)
        return None

    if k.startswith("update_block.recurrent_block.convgru"):
        m = re.match(
            r"update_block\.recurrent_block\.convgru(\d)\.conv([zrq])\.(.*)", k
        )
        if m:
            stage, gate, rest = m.groups()
            return f"update_block.gru.conv{gate}{stage}.{rest}"
        return None

    if k.startswith("update_block.flow_head."):
        return k  # names coincide

    if k.startswith("mask_predictor."):
        k = k.removeprefix("mask_predictor.")
        if k.startswith("convrelu.0."):
            return "update_block.mask.0." + k.removeprefix("convrelu.0.")
        if k.startswith("conv."):
            return "update_block.mask.2." + k.removeprefix("conv.")
        return None

    return None


def convert_torchvision_state_dict(state_dict: dict) -> dict:
    """torchvision `raft_large` (Raft_Large_Weights) -> JAX params.

    The reference loads RAFT through torchvision
    (`flowmap/flow/flow_predictor_raft.py:24-33`); this renames its module
    tree onto the princeton layout and reuses `convert_torch_state_dict`.
    NOTE: torchvision itself is not installable in this zero-egress image, so
    the rename map is validated structurally (bijection onto the princeton
    schema, tests/test_raft.py) rather than against a live torchvision model.
    """
    renamed = {}
    for key, value in state_dict.items():
        new_key = _torchvision_key_to_princeton(key)
        if new_key is not None:
            renamed[new_key] = value
    return convert_torch_state_dict(renamed)
