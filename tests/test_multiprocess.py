"""Real multi-process `jax.distributed` exercise: two CPU processes join a
process group via `maybe_initialize_distributed`, allgather across hosts, and
run a globally-sharded jit reduction. This is the TPU-pod analogue of the
reference's Lightning DDP multi-node path (`flowmap/pretrain.py:54-75`)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = """
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from flowmap_tpu.parallel.distributed import maybe_initialize_distributed

assert maybe_initialize_distributed(), "explicit env must trigger init"
assert jax.process_count() == 2, jax.process_count()
pid = jax.process_index()

import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

gathered = multihost_utils.process_allgather(jnp.asarray([pid], jnp.int32))

devices = np.asarray(jax.devices())
mesh = Mesh(devices, ("data",))
rows_per_process = len(jax.local_devices())
local = np.full((rows_per_process, 4), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local
)
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(garr)
# The P() output is replicated globally; read this process's local replica.
total = np.asarray(total.addressable_data(0))

Path = __import__("pathlib").Path
Path(sys.argv[1]).write_text(json.dumps({
    "pid": int(pid),
    "num_devices": len(devices),
    "gathered": np.asarray(gathered).reshape(-1).tolist(),
    "total": float(np.asarray(total).reshape(-1)[0]),
}))
"""


def test_import_does_not_initialize_backend():
    """`jax.distributed.initialize()` must run before any XLA backend exists,
    so importing the entry points must not create one. (Round-3 regression:
    a module-level `jnp.asarray` constant in midas_net.py initialized the
    backend at import, killing multi-process launch.)"""
    check = (
        "import flowmap_tpu.pretrain, flowmap_tpu.overfit, flowmap_tpu.subsample\n"
        "import flowmap_tpu.config, flowmap_tpu.training.overfit\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'XLA backend initialized at import: {list(xb._backends)}'\n"
    )
    env = dict(os.environ)
    env.update(PYTHONPATH=str(Path(__file__).parent.parent), JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", check],
        env=env,
        cwd=Path(__file__).parent.parent,
        capture_output=True,
        timeout=180,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]


def test_two_process_distributed_group(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PYTHONPATH=str(Path(__file__).parent.parent),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            FLOWMAP_COORDINATOR=f"localhost:{port}",
            FLOWMAP_NUM_PROCESSES="2",
            FLOWMAP_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(tmp_path / f"out_{pid}.json")],
                env=env,
                cwd=Path(__file__).parent.parent,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )

    try:
        for proc in procs:
            out, err = proc.communicate(timeout=180)
            assert proc.returncode == 0, err.decode()[-2000:]
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()

    for pid in range(2):
        result = json.loads((tmp_path / f"out_{pid}.json").read_text())
        assert result["pid"] == pid
        # 2 local CPU devices per process -> 4 global devices.
        assert result["num_devices"] == 4
        assert result["gathered"] == [0, 1]
        # Rows: 2 of value 1.0 (process 0) + 2 of value 2.0 (process 1), 4 cols.
        assert result["total"] == 2 * 4 * 1.0 + 2 * 4 * 2.0


def test_two_process_pretrain_cli(tmp_path):
    """The pretrain CLI runs data-parallel across two processes: each rank
    loads its own RE10k batch shard, the jitted step spans the global mesh,
    and rank 0 logs metrics (reference DDP parity, `flowmap/pretrain.py:54-75`)."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).parent))
    try:
        from test_datasets import _re10k_chunk
    finally:
        _sys.path.pop(0)

    data_root, _ = _re10k_chunk(tmp_path, n_frames=8, h=48, w=48)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = Path(__file__).parent.parent
    out_dirs = [tmp_path / f"rank{pid}" for pid in range(2)]
    overrides = [
        "dataset=[re10k]",
        f"dataset.re10k.roots=[{data_root}]",
        "dataset.re10k.image_shape=[64,64]",
        "frame_sampler.num_frames=4",
        "model.backbone.pretrained=false",
        "model.backbone.mapping=exp",
        "model.intrinsics.num_procrustes_points=64",
        "model.intrinsics.num_candidates=4",
        "model.intrinsics.regression=null",
        "model.extrinsics.num_points=64",
        "loss=[flow]",
        "visualizer=[]",
        "trainer.max_steps=2",
        "trainer.val_check_interval=1",
        "checkpoint.every_n_train_steps=1000",
        "cropping.image_shape=[32,32]",
        "cropping.flow_scale_multiplier=2",
        "cropping.patch_size=16",
        "data_module.train.batch_size=1",
        "data_module.train.num_workers=1",
    ]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PYTHONPATH=str(repo),
            JAX_PLATFORMS="cpu",
            FLOWMAP_PLATFORM="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            FLOWMAP_COORDINATOR=f"localhost:{port}",
            FLOWMAP_NUM_PROCESSES="2",
            FLOWMAP_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "flowmap_tpu.pretrain"]
                + overrides
                + [f"output_dir={out_dirs[pid]}"],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )

    outs = []
    try:
        for proc in procs:
            out, err = proc.communicate(timeout=540)
            assert proc.returncode == 0, err.decode()[-3000:]
            outs.append(out.decode())
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()

    # Rank 0 prints per-step metrics; rank 1 stays quiet.
    assert "step 1:" in outs[0] and "step 2:" in outs[0]
    assert "loss/total" in outs[0]
    assert "step 1:" not in outs[1]
