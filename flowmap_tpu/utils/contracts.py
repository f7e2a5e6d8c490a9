"""Runtime shape-contract enforcement (reference `flowmap/overfit.py:16-19`).

The reference wraps every first-party module in
`jaxtyping.install_import_hook(("flowmap",), ("beartype", "beartype"))` so
each `Float[Array, "b f 3 3"]`-annotated function is checked per call — its
de-facto unit-test layer (SURVEY.md §4.1). beartype is not in this image, so
the hook uses typeguard (same jaxtyping integration point). Enforcement is
opt-in:

- CLIs: `FLOWMAP_CHECK_SHAPES=1 python -m flowmap_tpu.overfit ...`
  (`maybe_install_shape_contracts()` runs before the heavy submodule imports,
  so annotated modules imported afterwards are instrumented);
- tests: `tests/test_shape_contracts.py` instruments the geometry/loss core
  and asserts that a wrong-shape call fails loudly.

Checking is trace-time only (shapes are static under jit), so the cost is
per-trace, not per-step.
"""

from __future__ import annotations

import os

_HOOK = None


def install_shape_contracts(packages: tuple[str, ...] = ("flowmap_tpu",)):
    """Install the jaxtyping import hook for `packages`. Modules imported
    AFTER this call are instrumented; call before importing submodules."""
    global _HOOK
    if _HOOK is not None:
        return _HOOK
    import jaxtyping

    _HOOK = jaxtyping.install_import_hook(packages, "typeguard.typechecked")
    _HOOK.__enter__()
    return _HOOK


def maybe_install_shape_contracts() -> bool:
    """Entry-point gate: install when FLOWMAP_CHECK_SHAPES is truthy."""
    if os.environ.get("FLOWMAP_CHECK_SHAPES", "").lower() in ("1", "true", "yes"):
        install_shape_contracts()
        return True
    return False
