"""Offline tests of the wandb facade (no wandb installed in this image).

Parity targets: artifact upload of run outputs (reference
`flowmap/overfit.py:149-153`), code upload
(`flowmap/misc/common_training_setup.py:53-55`), graceful no-op degradation
when wandb is absent or mode="disabled".
"""

from __future__ import annotations

import sys
import types
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from flowmap_tpu.utils import wandb_tools
from flowmap_tpu.utils.wandb_tools import WandbLogger


@dataclass
class _Cfg:
    project: str = "flowmap"
    mode: str = "offline"
    name: Optional[str] = None
    group: Optional[str] = None
    tags: Optional[list] = None


class _FakeArtifact:
    def __init__(self, name, type):
        self.name = name
        self.type = type
        self.files = {}
        self.dirs = {}
        self.waited = False

    def add_file(self, path, name=None):
        self.files[name or Path(path).name] = path

    def add_dir(self, path, name=None):
        self.dirs[name or Path(path).name] = path

    def wait(self):
        self.waited = True


class _FakeRun:
    def __init__(self):
        self.id = "run123"
        self.logged = []
        self.artifacts = []
        self.code_roots = []
        self.finished = False

    def log(self, data, step=None):
        self.logged.append((step, data))

    def log_code(self, root):
        self.code_roots.append(root)

    def log_artifact(self, artifact):
        self.artifacts.append(artifact)
        return artifact

    def finish(self):
        self.finished = True


def _install_fake_wandb(monkeypatch):
    fake = types.ModuleType("wandb")
    run = _FakeRun()
    fake.init = lambda **kw: run
    fake.Artifact = _FakeArtifact
    fake.Image = lambda img: ("image", getattr(img, "shape", None))
    monkeypatch.setitem(sys.modules, "wandb", fake)
    return fake, run


def test_disabled_mode_is_noop(tmp_path):
    logger = WandbLogger(_Cfg(mode="disabled"), tmp_path)
    # None of these should raise even with wandb absent from the image.
    logger.log_metrics({"loss": 1.0}, step=0)
    logger.log_code(tmp_path)
    logger.log_artifact("colmap_{run_id}", "colmap", {"a": tmp_path / "x"})
    logger.finish()


def test_missing_wandb_degrades_to_noop(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # force ImportError
    assert not wandb_tools.wandb_available()
    logger = WandbLogger(_Cfg(mode="online"), tmp_path)
    logger.log_metrics({"loss": 1.0}, step=0)
    logger.finish()


def test_artifact_upload_mirrors_reference(tmp_path, monkeypatch):
    _, run = _install_fake_wandb(monkeypatch)
    (tmp_path / "colmap.zip").write_bytes(b"zipbytes")
    ckpt_dir = tmp_path / "final_params"
    ckpt_dir.mkdir()
    (ckpt_dir / "w.bin").write_bytes(b"\x00")

    logger = WandbLogger(_Cfg(), tmp_path)
    logger.log_code(tmp_path / "src")
    logger.log_artifact(
        "colmap_{run_id}",
        "colmap",
        {
            "colmap.zip": tmp_path / "colmap.zip",
            "final_params": ckpt_dir,
            "missing.npz": tmp_path / "nope.npz",  # skipped, not an error
        },
    )
    logger.finish()

    assert run.code_roots == [str(tmp_path / "src")]
    assert len(run.artifacts) == 1
    art = run.artifacts[0]
    # Reference names the artifact colmap_<run_id> with type "colmap"
    # (overfit.py:149-151).
    assert art.name == "colmap_run123"
    assert art.type == "colmap"
    assert "colmap.zip" in art.files
    assert "final_params" in art.dirs
    assert "missing.npz" not in art.files
    assert art.waited  # reference blocks on upload (overfit.py:153)
    assert run.finished


def test_metrics_and_images_forwarded(tmp_path, monkeypatch):
    import numpy as np

    _, run = _install_fake_wandb(monkeypatch)
    logger = WandbLogger(_Cfg(), tmp_path)
    logger.log_metrics({"loss/total": np.float32(0.5)}, step=7)
    logger.log_image("depth", np.zeros((4, 4, 3)), step=7)
    steps = [s for s, _ in run.logged]
    assert steps == [7, 7]
    assert run.logged[0][1] == {"loss/total": 0.5}
