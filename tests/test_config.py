"""Config system tests: typed conversion, union discrimination, composition."""

from dataclasses import dataclass, field
from pathlib import Path
from typing import Literal, Optional, Union

import pytest

from flowmap_tpu.config import OverfitCfg, PretrainCfg, compose_config, from_dict
from flowmap_tpu.config.tools import separate_multiple_defaults


@dataclass(frozen=True)
class _A:
    name: Literal["a"] = "a"
    x: int = 1


@dataclass(frozen=True)
class _B:
    name: Literal["b"] = "b"
    y: float = 2.0
    path: Optional[Path] = None


_AB = Union[_A, _B]


class TestFromDict:
    def test_union_discrimination(self):
        assert from_dict(_AB, {"name": "a", "x": 5}) == _A(x=5)
        assert from_dict(_AB, {"name": "b", "y": 1.5}) == _B(y=1.5)

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError, match="unknown plugin name"):
            from_dict(_AB, {"name": "c"})

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="unknown keys"):
            from_dict(_A, {"name": "a", "nope": 1})

    def test_optional_and_path(self):
        out = from_dict(_B, {"name": "b", "path": "/tmp/x"})
        assert out.path == Path("/tmp/x")
        assert from_dict(_B, {"name": "b", "path": None}).path is None

    def test_tuple_conversion(self):
        @dataclass(frozen=True)
        class C:
            shape: tuple[int, int] = (1, 1)

        assert from_dict(C, {"shape": [4, 5]}).shape == (4, 5)

    def test_int_rejects_float(self):
        @dataclass(frozen=True)
        class C:
            n: int = 0

        with pytest.raises((TypeError, ValueError)):
            from_dict(C, {"n": 1.5})
        assert from_dict(C, {"n": 50000.0}).n == 50000

    def test_separate_multiple_defaults(self):
        out = separate_multiple_defaults(_AB)({"a": {"x": 3}, "b": None})
        assert out == [_A(x=3), _B()]


class TestCompose:
    def test_overfit_defaults(self):
        cfg = compose_config("overfit", OverfitCfg, [])
        assert cfg.trainer.max_steps == 2000
        assert cfg.model_wrapper.lr == pytest.approx(3e-5)
        assert cfg.cropping.image_shape == 43200
        assert [l.name for l in cfg.loss] == ["flow", "tracking"]
        assert cfg.model.intrinsics.name == "softmin"
        assert cfg.model.intrinsics.regression.after_step == 1000

    def test_pretrain_defaults(self):
        cfg = compose_config("pretrain", PretrainCfg, [])
        assert cfg.trainer.max_steps == 50000
        assert cfg.model.intrinsics.regression is None
        assert cfg.cropping.image_shape == (150, 200)
        assert cfg.frame_sampler.num_frames == 8

    def test_group_and_dotted_overrides(self):
        cfg = compose_config(
            "overfit",
            OverfitCfg,
            [
                "model/backbone=explicit_depth",
                "model.backbone.initial_depth=0.5",
                "trainer.max_steps=7",
                "loss=[flow]",
            ],
        )
        assert cfg.model.backbone.name == "explicit_depth"
        assert cfg.model.backbone.initial_depth == 0.5
        assert cfg.trainer.max_steps == 7
        assert len(cfg.loss) == 1
