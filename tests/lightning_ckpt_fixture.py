"""Format-exact synthetic Lightning checkpoint fixture (VERDICT r4 item 5).

The real `initialization_finetuned.ckpt` is unreachable in this zero-egress
image, so this builds a checkpoint that is *structurally* exact: the key
layout a reference pretrain run actually saves
(`flowmap/pretrain.py` -> Lightning `Trainer.save_checkpoint`), namely:

- `state_dict` with the `ModelWrapperPretrain` module tree:
  * `model.backbone.midas.*` — torch-hub MiDaS_small WITHOUT
    `scratch.output_conv.*` (the reference replaces it with `nn.Identity()`
    before training, `backbone_midas.py:55-56`) but WITH all BN
    `num_batches_tracked` buffers;
  * `model.backbone.midas_out.{0,2,4}.{weight,bias}` — the detached head;
  * `model.backbone.corr_weighter_perpoint.{0,2,4}.{weight,bias}`
    (`weight_sensitivity: null` in `config/model/backbone/midas.yaml`);
  * `model.intrinsics.intrinsics_regressed.focal_length`
    (softmin regression is configured in `config/model/intrinsics/softmin.yaml`);
  * `flow_predictor.*` — the frozen GMFlow weights ride along because the
    predictor is a module attribute of the wrapper (represented here by a
    handful of stand-in tensors; the loader must ignore them);
- Lightning bookkeeping: `epoch`, `global_step`, `pytorch-lightning_version`,
  `loops`, `callbacks`, `optimizer_states` (Adam state per param: `step`,
  `exp_avg`, `exp_avg_sq`, plus `param_groups`), `lr_schedulers`,
  `hparams_name`, `hyper_parameters`.
"""

from __future__ import annotations

from pathlib import Path


def make_reference_lightning_ckpt(path: Path, seed: int = 0):
    """Write a format-exact Lightning .ckpt; returns the raw state_dict."""
    import torch

    from tests.torch_midas_replica import MidasSmallTorch

    torch.manual_seed(seed)
    midas = MidasSmallTorch()
    for m in midas.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.num_batches_tracked.fill_(12345)

    state_dict: dict = {}
    midas_sd = midas.state_dict()
    # The head lives at backbone.midas_out; midas.scratch.output_conv is
    # Identity in the trained wrapper, so its params must NOT appear under
    # backbone.midas.*.
    for key, value in midas_sd.items():
        if key.startswith("scratch.output_conv."):
            idx_field = key.removeprefix("scratch.output_conv.")
            state_dict[f"model.backbone.midas_out.{idx_field}"] = value
        else:
            state_dict[f"model.backbone.midas.{key}"] = value

    # Correspondence-weight MLP for MiDaS_small: make_net([128, 128, 64, 1])
    # => Sequential param indices 0, 2, 4 (`backbone_midas.py:16-30,58-65`).
    dims = [(128, 128), (128, 64), (64, 1)]
    for idx, (cin, cout) in zip((0, 2, 4), dims):
        state_dict[f"model.backbone.corr_weighter_perpoint.{idx}.weight"] = (
            torch.randn(cout, cin) * 0.05
        )
        state_dict[f"model.backbone.corr_weighter_perpoint.{idx}.bias"] = (
            torch.zeros(cout)
        )

    state_dict["model.intrinsics.intrinsics_regressed.focal_length"] = (
        torch.tensor(1.2345)
    )

    # Frozen flow-predictor weights ride along in real checkpoints; a loader
    # that chokes on unknown keys would fail here.
    for name in (
        "flow_predictor.flow.backbone.conv1.weight",
        "flow_predictor.flow.transformer.layers.0.self_attn.q_proj.weight",
        "flow_predictor.flow.upsampler.0.weight",
    ):
        state_dict[name] = torch.randn(4, 4)

    # Adam optimizer state for every trainable param, Lightning layout.
    trainable = [
        (k, v) for k, v in state_dict.items()
        if k.startswith("model.") and v.dtype.is_floating_point
    ]
    optimizer_state = {
        i: {
            "step": torch.tensor(50000.0),
            "exp_avg": torch.zeros_like(v),
            "exp_avg_sq": torch.zeros_like(v),
        }
        for i, (_, v) in enumerate(trainable)
    }
    checkpoint = {
        "epoch": 3,
        "global_step": 50000,
        "pytorch-lightning_version": "2.1.2",
        "state_dict": state_dict,
        "loops": {"fit_loop": {"state_dict": {}, "epoch_loop.state_dict": {}}},
        "callbacks": {
            "ModelCheckpoint{'monitor': None, 'mode': 'min'}": {
                "best_model_score": None,
                "best_model_path": "checkpoints/last.ckpt",
            }
        },
        "optimizer_states": [
            {
                "state": optimizer_state,
                "param_groups": [
                    {
                        "lr": 5e-5,
                        "betas": (0.9, 0.999),
                        "eps": 1e-8,
                        "weight_decay": 0.0,
                        "params": list(range(len(trainable))),
                    }
                ],
            }
        ],
        "lr_schedulers": [],
        "hparams_name": "kwargs",
        "hyper_parameters": {"cfg": {"lr": 5e-5, "patch_size": 32}},
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(checkpoint, path)
    return state_dict
