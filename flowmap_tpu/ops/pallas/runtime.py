"""Central gate for the Pallas kernel paths.

Every fused kernel in this package has an XLA formulation that is its
numerical reference; which one runs is decided here:

- default: kernels on TPU, XLA fallback elsewhere;
- ``FLOWMAP_PALLAS=force`` (or :func:`force_kernels`): kernel path
  everywhere — off-TPU the ``pallas_call`` runs in interpret mode. This is
  how CI proves the kernel graph itself (not just the fallback) composes
  with GSPMD frame sharding on the virtual CPU mesh
  (tests/test_kernels_sharded.py);
- ``FLOWMAP_PALLAS=off``: XLA fallback everywhere (A/B timing, debugging).

The env var is read per call (not at import) so tests can flip it.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax

_override: str | None = None  # None -> consult the env var


def _mode() -> str:
    if _override is not None:
        return _override
    return os.environ.get("FLOWMAP_PALLAS", "auto")


def on_tpu_backend() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def kernels_enabled() -> bool:
    """Should ops take the Pallas kernel path?"""
    mode = _mode()
    if mode == "force":
        return True
    if mode == "off":
        return False
    return on_tpu_backend()


def interpret_mode() -> bool:
    """interpret= for pallas_call: True only when forcing kernels off-TPU."""
    return kernels_enabled() and not on_tpu_backend()


def pallas_call(*args, **kwargs):
    """`pl.pallas_call` that interprets when kernels are forced off-TPU."""
    from jax.experimental import pallas as pl

    if interpret_mode():
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)


@contextmanager
def pallas_mode(mode: str):
    """Temporarily pin the kernel mode ("force" / "off" / "auto")."""
    global _override
    assert mode in ("force", "off", "auto"), mode
    prev = _override
    _override = mode
    try:
        yield
    finally:
        _override = prev
