"""Offline logger: PNG images + JSONL metrics under an output directory.

Parity: `flowmap/misc/local_logger.py:12-48` (PNGs to
`outputs/local/<key>/<idx>_<step>.png`, directory cleared on init), extended
with a metrics JSONL the reference lacks (its LocalLogger drops scalars).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np
from PIL import Image

LOG_PATH = Path("outputs/local")


class LocalLogger:
    def __init__(self, path: Path = LOG_PATH, clear: bool = True) -> None:
        self.path = Path(path)
        if clear and self.path.exists():
            shutil.rmtree(self.path, ignore_errors=True)
        self.path.mkdir(exist_ok=True, parents=True)
        self._metrics_file = self.path / "metrics.jsonl"

    def log_image(self, key: str, image: np.ndarray, step: int) -> None:
        """image: (h, w, 3) float in [0,1] or uint8."""
        directory = self.path / key
        directory.mkdir(exist_ok=True, parents=True)
        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(image).save(directory / f"{step:0>6}.png")

    def log_metrics(self, metrics: dict, step: int) -> None:
        record = {"step": int(step)}
        for k, v in metrics.items():
            record[k] = float(v)
        with open(self._metrics_file, "a") as f:
            f.write(json.dumps(record) + "\n")
