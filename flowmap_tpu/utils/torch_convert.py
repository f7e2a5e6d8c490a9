"""Torch checkpoint converters for the ported networks.

Maps public checkpoint state_dicts onto this framework's parameter trees:

- MiDaS_small (`midas_v21_small_256.pt`, the torch.hub model the reference
  loads in `flowmap/model/backbone/backbone_midas.py:50-56`): the encoder is
  timm's tf_efficientnet_lite3 wrapped by MiDaS into `pretrained.layer{1-4}`
  Sequentials; BatchNorms are folded into the preceding convs (the predictor
  is used frozen-ish; folding matches eval-mode numerics exactly).
- GMFlow / RAFT converters live next to their models
  (`flowmap_tpu/flow/gmflow.py`, `flowmap_tpu/flow/raft.py`).

Layout conventions: torch conv OIHW -> JAX HWIO; torch linear (out, in) ->
(in, out).
"""

from __future__ import annotations

import numpy as np

_BN_EPS = 1e-3  # TF-style EfficientNet BN epsilon (timm tf_ variants)


def _to_np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def _conv_hwio(weight) -> np.ndarray:
    return _to_np(weight).transpose(2, 3, 1, 0)


def _fold_bn(sd: dict, conv_key: str, bn_key: str) -> dict:
    """Fold eval-mode BatchNorm into the preceding conv; returns my conv
    params {kernel, bias} in HWIO."""
    w = _to_np(sd[f"{conv_key}.weight"])  # OIHW
    gamma = _to_np(sd[f"{bn_key}.weight"])
    beta = _to_np(sd[f"{bn_key}.bias"])
    mean = _to_np(sd[f"{bn_key}.running_mean"])
    var = _to_np(sd[f"{bn_key}.running_var"])
    scale = gamma / np.sqrt(var + _BN_EPS)
    w_folded = w * scale[:, None, None, None]
    bias = beta - mean * scale
    if f"{conv_key}.bias" in sd:
        bias = bias + _to_np(sd[f"{conv_key}.bias"]) * scale
    return {"kernel": w_folded.transpose(2, 3, 1, 0), "bias": bias}


def _plain_conv(sd: dict, key: str, bias: bool = True) -> dict:
    params = {"kernel": _conv_hwio(sd[f"{key}.weight"])}
    if bias and f"{key}.bias" in sd:
        params["bias"] = _to_np(sd[f"{key}.bias"])
    return params


# (midas layer path, has_expansion) for each of the 24 lite3 blocks, in my
# flat block order (stage-major).
_LITE3_BLOCK_PATHS: list[tuple[str, bool]] = (
    [("pretrained.layer1.3.0", False)]
    + [(f"pretrained.layer1.4.{i}", True) for i in range(3)]
    + [(f"pretrained.layer2.0.{i}", True) for i in range(3)]
    + [(f"pretrained.layer3.0.{i}", True) for i in range(5)]
    + [(f"pretrained.layer3.1.{i}", True) for i in range(5)]
    + [(f"pretrained.layer4.0.{i}", True) for i in range(6)]
    + [(f"pretrained.layer4.1.{i}", True) for i in range(1)]
)


def convert_midas_small(state_dict: dict) -> dict:
    """torch-hub MiDaS_small state_dict -> `midas_small_init(fold_bn=True)`
    parameter layout (see `flowmap_tpu/model/backbone/midas_net.py`)."""
    sd = state_dict

    encoder: dict = {
        "stem_conv": _fold_bn(sd, "pretrained.layer1.0", "pretrained.layer1.1"),
        "stem_bn": None,
        "blocks": [],
    }
    for path, has_expansion in _LITE3_BLOCK_PATHS:
        block: dict = {}
        if has_expansion:
            block["expand_conv"] = _fold_bn(sd, f"{path}.conv_pw", f"{path}.bn1")
            block["expand_bn"] = None
            block["dw_conv"] = _fold_bn(sd, f"{path}.conv_dw", f"{path}.bn2")
            block["dw_bn"] = None
            block["project_conv"] = _fold_bn(sd, f"{path}.conv_pwl", f"{path}.bn3")
            block["project_bn"] = None
        else:
            block["dw_conv"] = _fold_bn(sd, f"{path}.conv_dw", f"{path}.bn1")
            block["dw_bn"] = None
            block["project_conv"] = _fold_bn(sd, f"{path}.conv_pw", f"{path}.bn2")
            block["project_bn"] = None
        encoder["blocks"].append(block)

    def fusion(name: str) -> dict:
        return {
            "rcu1": {
                "conv1": _plain_conv(sd, f"scratch.{name}.resConfUnit1.conv1"),
                "conv2": _plain_conv(sd, f"scratch.{name}.resConfUnit1.conv2"),
            },
            "rcu2": {
                "conv1": _plain_conv(sd, f"scratch.{name}.resConfUnit2.conv1"),
                "conv2": _plain_conv(sd, f"scratch.{name}.resConfUnit2.conv2"),
            },
            "out_conv": _plain_conv(sd, f"scratch.{name}.out_conv"),
        }

    params = {
        "encoder": encoder,
        "scratch": {
            f"layer{i}_rn": _plain_conv(sd, f"scratch.layer{i}_rn", bias=False)
            for i in range(1, 5)
        },
        "refinenet4": fusion("refinenet4"),
        "refinenet3": fusion("refinenet3"),
        "refinenet2": fusion("refinenet2"),
        "refinenet1": fusion("refinenet1"),
        "head": {
            "conv1": _plain_conv(sd, "scratch.output_conv.0"),
            "conv2": _plain_conv(sd, "scratch.output_conv.2"),
            "conv3": _plain_conv(sd, "scratch.output_conv.4"),
        },
    }

    import jax.numpy as jnp

    def to_jnp(tree):
        if isinstance(tree, dict):
            return {k: to_jnp(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [to_jnp(v) for v in tree]
        if tree is None:
            return None
        return jnp.asarray(tree)

    return to_jnp(params)


def load_midas_checkpoint(path) -> dict:
    """Load a torch-hub MiDaS_small .pt checkpoint file."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    return convert_midas_small(state_dict)


def convert_reference_checkpoint(state_dict: dict) -> dict:
    """Convert a reference FlowMap Lightning checkpoint (the published
    `initialization_finetuned.ckpt`, `flowmap/overfit.py:89-92`) into this
    framework's model params.

    The Lightning state_dict prefixes the wrapped model as `model.`; inside,
    `model.backbone.midas.*` is the torch-hub MiDaS (converted with BN
    folding), `model.backbone.corr_weighter_perpoint.*` is the weight MLP,
    and `model.intrinsics.*` may carry a regressed focal length.
    """
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}

    midas_sd = {
        k.removeprefix("backbone.midas."): v
        for k, v in sd.items()
        if k.startswith("backbone.midas.")
    }
    # Lightning-trained checkpoints carry the depth head SEPARATELY: the
    # reference moves `midas.scratch.output_conv` to `self.midas_out` and
    # replaces it with nn.Identity before training (`backbone_midas.py:55-56`),
    # so the saved keys are `backbone.midas_out.{0,2,4}.*`, not
    # `backbone.midas.scratch.output_conv.*`. Map them back so
    # `convert_midas_small` sees the torch-hub layout it expects.
    for idx in (0, 2, 4):
        for field in ("weight", "bias"):
            key = f"backbone.midas_out.{idx}.{field}"
            if key in sd:
                midas_sd[f"scratch.output_conv.{idx}.{field}"] = sd[key]
    params: dict = {"backbone": {}, "intrinsics": {}, "extrinsics": {}}
    if midas_sd:
        params["backbone"]["midas"] = convert_midas_small(midas_sd)

    # Correspondence-weight MLP: Sequential(Linear, ReLU, Linear, ReLU, Linear)
    # -> layer indices 0, 2, 4 (`backbone_midas.py:16-30`).
    mlp = []
    for idx in (0, 2, 4):
        key = f"backbone.corr_weighter_perpoint.{idx}.weight"
        if key in sd:
            mlp.append(
                {
                    "kernel": _to_np(sd[key]).T,
                    "bias": _to_np(sd[f"backbone.corr_weighter_perpoint.{idx}.bias"]),
                }
            )
    if mlp:
        import jax.numpy as jnp

        params["backbone"]["corr_weighter"] = [
            {k: jnp.asarray(v) for k, v in layer.items()} for layer in mlp
        ]

    for key in (
        "intrinsics.intrinsics_regressed.focal_length",
        "intrinsics.focal_length",
    ):
        if key in sd:
            import jax.numpy as jnp

            params["intrinsics"]["focal_length"] = jnp.asarray(_to_np(sd[key]))
            break

    return params


def load_reference_checkpoint(path) -> dict:
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = checkpoint.get("state_dict", checkpoint)
    return convert_reference_checkpoint(state_dict)
