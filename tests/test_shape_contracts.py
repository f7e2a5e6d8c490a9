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
