"""SLURM fanout emission tests for scripts/run_batch.py (reference parity:
`scripts/run_flowmap.sh` per-scene x per-ablation array fanout)."""

import subprocess
import sys
from pathlib import Path


def _fake_dataset(tmp_path, scenes):
    root = tmp_path / "llff"
    for scene in scenes:
        (root / scene).mkdir(parents=True)
    return root


def test_slurm_dry_run_emits_array_script(tmp_path):
    root = _fake_dataset(tmp_path, ["fern", "flower", "orchids"])
    out = tmp_path / "results"
    repo = Path(__file__).parent.parent
    result = subprocess.run(
        [
            sys.executable,
            str(repo / "scripts/run_batch.py"),
            "--root",
            str(root),
            "--out",
            str(out),
            "--experiments",
            "ablation_a,ablation_b",
            "--slurm",
            "--dry-run",
            "trainer.max_steps=10",
        ],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    assert result.returncode == 0, result.stderr[-2000:]

    script = (out / "submit.sbatch").read_text()
    # 3 scenes x 2 experiments = 6 array tasks.
    assert "#SBATCH --array=0-5" in script
    assert script.count("-m flowmap_tpu.overfit") == 6
    assert "+experiment=ablation_a" in script
    assert "+experiment=ablation_b" in script
    assert "dataset.llff.scene=fern" in script
    assert "trainer.max_steps=10" in script
    assert f"output_dir={out}/ablation_b/orchids" in script
    assert "dry-run; submit with: sbatch" in result.stdout


def test_shard_and_scene_selection(tmp_path):
    root = _fake_dataset(tmp_path, ["a", "b", "c", "d"])
    out = tmp_path / "results"
    repo = Path(__file__).parent.parent
    result = subprocess.run(
        [
            sys.executable,
            str(repo / "scripts/run_batch.py"),
            "--root",
            str(root),
            "--out",
            str(out),
            "--shard",
            "1/2",
            "--slurm",
            "--dry-run",
        ],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    script = (out / "submit.sbatch").read_text()
    # Shard 1/2 of [a,b,c,d] = [b,d].
    assert "#SBATCH --array=0-1" in script
    assert "scene=b" in script and "scene=d" in script
    assert "scene=a" not in script and "scene=c" not in script
