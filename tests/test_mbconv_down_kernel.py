"""Parity tests for the fused stride-2 MBConv kernel (ops/pallas/mbconv_down).

The XLA `midas_net._mbconv` stride-2 path is the oracle (TF/XLA SAME
semantics). At HIGHEST matmul precision both paths are exact in f32; JAX's
clip-VJP tie convention (0.5 at exact 0/6, common with zero-init biases) is
reproduced by the kernel. On CPU the kernels run in interpret mode via the
runtime gate. NOTE: the compiled TPU kernel currently faults the TPU worker
at runtime and is disabled by default (FLOWMAP_MBCONV_DOWN_MIN_HW) — these
tests pin down the math so the TPU debug can proceed against a trusted
reference.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from flowmap_tpu.model.backbone.midas_net import _mbconv, _mbconv_init
from flowmap_tpu.ops.pallas.runtime import pallas_mode


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))


CONFIGS = [
    # (cin, cout, expand, k, h, w) — k3/k5, odd widths, and a tall case
    # that exercises the two-row-half split path (h/2 >= 16).
    (6, 8, 4, 3, 8, 12),
    (8, 10, 6, 5, 8, 12),
    (24, 32, 6, 3, 16, 24),
    (6, 8, 4, 3, 32, 24),
    (8, 10, 6, 5, 32, 24),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_value_and_grad_parity(cfg):
    cin, cout, expand, k, h, w = cfg
    os.environ["FLOWMAP_MBCONV_DOWN_MIN_HW"] = "0"
    try:
        p = _mbconv_init(
            jax.random.PRNGKey(0), cin, cout, expand, k, fold_bn=True
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (3, h, w, cin))

        def loss(x, p, mode):
            with pallas_mode(mode):
                with jax.default_matmul_precision("highest"):
                    y = _mbconv(p, x, cin, cout, expand, 2, k)
                    return jnp.sum(jnp.sin(y)), y

        f = jax.jit(
            jax.value_and_grad(loss, (0, 1), has_aux=True), static_argnums=2
        )
        (v0, y0), g0 = f(x, p, "off")
        (v1, y1), g1 = f(x, p, "force")
        assert _rel(y1, y0) < 1e-5
        errs = jax.tree_util.tree_map(_rel, g1, g0)
        assert max(jax.tree_util.tree_leaves(errs)) < 1e-5, errs
    finally:
        del os.environ["FLOWMAP_MBCONV_DOWN_MIN_HW"]


def test_fault_repro_script_is_gated():
    """The s1b0 in-step TPU fault has a committed minimal repro
    (scripts/probes/repro_mbconv_fault.py, VERDICT r4 item 7). It must
    refuse to dispatch without --yes, because a fault wedges the TPU grant
    for ~3 minutes. The actual on-TPU repro is manual by design."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "scripts/probes/repro_mbconv_fault.py"],
        cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0
    assert "Refusing to run" in proc.stdout
