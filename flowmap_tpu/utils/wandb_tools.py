"""Weights & Biases integration (optional, gracefully degraded).

Parity: `flowmap/misc/wandb_tools.py` + the logger selection in
`flowmap/misc/common_training_setup.py:32-56`. wandb is not a hard
dependency: without the package (or with mode="disabled") every call is a
no-op and the LocalLogger remains the system of record.

Checkpoint references of the form `wandb://run_id:version` resolve to
downloaded artifact paths like the reference
(`flowmap/misc/wandb_tools.py:13-62`).
"""

from __future__ import annotations

from pathlib import Path


def wandb_available() -> bool:
    try:
        import wandb  # noqa: F401

        return True
    except ImportError:
        return False


class WandbLogger:
    """Minimal logger facade matching LocalLogger's interface."""

    def __init__(self, cfg, output_dir: Path) -> None:
        self._run = None
        if cfg.mode == "disabled" or not wandb_available():
            return
        import wandb

        self._run = wandb.init(
            project=cfg.project,
            name=cfg.name,
            group=cfg.group,
            tags=cfg.tags,
            mode=cfg.mode,
            dir=str(output_dir),
        )

    def log_metrics(self, metrics: dict, step: int) -> None:
        if self._run is not None:
            self._run.log({k: float(v) for k, v in metrics.items()}, step=step)

    def log_image(self, key: str, image, step: int) -> None:
        if self._run is not None:
            import wandb

            self._run.log({key: wandb.Image(image)}, step=step)

    def log_code(self, root: Path | str) -> None:
        """Upload the package source to the run (reference
        `flowmap/misc/common_training_setup.py:53-55`)."""
        if self._run is not None:
            self._run.log_code(str(root))

    def log_artifact(self, name: str, type: str, files: dict[str, Path]) -> None:
        """Upload run outputs as a wandb artifact (reference
        `flowmap/overfit.py:149-153`: the COLMAP export is attached to the
        run as an artifact named `colmap_<run_id>` of type "colmap").

        `files` maps artifact-internal names to local paths; directories are
        added recursively. Missing paths are skipped (e.g. optional outputs).
        """
        if self._run is None:
            return
        import wandb

        artifact = wandb.Artifact(name.format(run_id=self._run.id), type=type)
        for alias, path in files.items():
            path = Path(path)
            if not path.exists():
                continue
            if path.is_dir():
                artifact.add_dir(str(path), name=alias)
            else:
                artifact.add_file(str(path), name=alias)
        logged = self._run.log_artifact(artifact)
        # Block until the upload completes, as the reference does — the
        # process may exit immediately after.
        if hasattr(logged, "wait"):
            logged.wait()

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()


def resolve_checkpoint(path_or_ref: str, cache_dir: Path = Path(".cache/wandb")) -> Path:
    """Resolve `wandb://run_id:version` artifact references to local paths;
    plain paths pass through."""
    if not str(path_or_ref).startswith("wandb://"):
        return Path(path_or_ref)
    if not wandb_available():
        raise RuntimeError(
            f"checkpoint {path_or_ref!r} needs wandb, which is not installed"
        )
    import wandb

    run_id, _, version = str(path_or_ref).removeprefix("wandb://").partition(":")
    api = wandb.Api()
    artifact = api.artifact(f"{run_id}:{version or 'latest'}")
    directory = artifact.download(root=str(cache_dir))
    checkpoints = sorted(Path(directory).rglob("*.ckpt")) + sorted(
        Path(directory).rglob("*")
    )
    return checkpoints[0]
