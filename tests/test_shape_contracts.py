"""Runtime shape-contract checking (the reference's de-facto unit-test layer).

The reference installs `jaxtyping.install_import_hook(("flowmap",),
("beartype", "beartype"))` at every entry point (`flowmap/overfit.py:16-19`)
so every annotated function is shape-checked on every call. beartype isn't in
this image; this test reimports the geometry core under the jaxtyping +
typeguard hook and exercises it, so annotation violations fail loudly.
"""

import importlib
import sys

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def checked_geometry():
    import jaxtyping

    removed = {
        name: sys.modules.pop(name)
        for name in list(sys.modules)
        if name.startswith("flowmap_tpu.ops")
    }
    try:
        with jaxtyping.install_import_hook(
            "flowmap_tpu.ops.geometry", "typeguard.typechecked"
        ):
            module = importlib.import_module("flowmap_tpu.ops.geometry")
            yield module
    finally:
        for name in list(sys.modules):
            if name.startswith("flowmap_tpu.ops"):
                sys.modules.pop(name)
        sys.modules.update(removed)


def test_valid_shapes_pass(checked_geometry):
    G = checked_geometry
    t = jnp.eye(4)[None]
    out = G.rigid_inverse(t)
    assert out.shape == (1, 4, 4)
    xy, idx = G.sample_image_grid((4, 6))
    assert xy.shape == (4, 6, 2)


def test_bad_shapes_raise(checked_geometry):
    G = checked_geometry
    with pytest.raises(Exception):
        # 3x3 is not a rigid 4x4 transform.
        G.rigid_inverse(jnp.eye(3))


def test_cli_env_gate_installs_and_catches(tmp_path):
    """FLOWMAP_CHECK_SHAPES=1 on an entry point instruments the package:
    a deliberately wrong-shape call into the geometry core fails loudly
    (the reference's `install_import_hook` behavior, `overfit.py:16-19`)."""
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path

    program = (
        "import flowmap_tpu.overfit\n"  # installs the hook via the env gate
        "import jax.numpy as jnp\n"
        "from flowmap_tpu.ops import geometry\n"
        "try:\n"
        "    geometry.rigid_inverse(jnp.eye(3))\n"
        "except Exception as e:\n"
        "    print('CAUGHT', type(e).__name__)\n"
        "else:\n"
        "    print('NOT CAUGHT')\n"
    )
    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(Path(__file__).parent.parent),
        JAX_PLATFORMS="cpu",
        FLOWMAP_CHECK_SHAPES="1",
    )
    proc = subprocess.run(
        [_sys.executable, "-c", program],
        env=env,
        cwd=Path(__file__).parent.parent,
        capture_output=True,
        timeout=300,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CAUGHT" in proc.stdout, proc.stdout + proc.stderr[-500:]
