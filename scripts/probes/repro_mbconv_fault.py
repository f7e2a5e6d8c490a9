"""Minimal repro for the in-step stride-2 MBConv TPU worker fault.

Issue-style writeup (VERDICT r4 item 7; observed during round 4, recorded in
docs/MOSAIC_NOTES.md "Per-compile XLA options" and ROADMAP round 4):

SYMPTOM
  Dispatching the compiled (non-interpret) `mbconv_down` kernel at the
  encoder's s1b0 reference shape — n=150 frames, 80x112 input, 24 -> 144
  expand, depthwise 3x3 stride 2, project -> 32 (grid = 150 frames, ~10 MB
  of VMEM blocks per grid step) — sporadically kills the TPU worker:
  `UNAVAILABLE: TPU device error — often a kernel fault`, sometimes
  `TPU worker process crashed or restarted`. The same kernel is
  numerically exact and stable:
    * in interpret mode (CPU) at every tested shape incl. this one
      (tests/test_mbconv_down_kernel.py),
    * compiled on TPU at small shapes and standalone at n<=32,
    * compiled on TPU standalone at n=150 — *usually*; the fault is
      scale-dependent and sporadic (more likely inside the full train
      step, and reproduced once forward-only under a raised 64 MB
      scoped-vmem budget).

WHAT IT IS NOT
  - Not a VMEM budget overflow: those fail at COMPILE time with
    "Ran out of memory in memory space vmem" (see MOSAIC_NOTES).
  - Not the round-1 grid_sample fault (fixed; docs/TPU_FAULT_NOTES.md).
  - Not numerics: value+grad parity vs the XLA formulation is 3e-7.

STATUS / DISPOSITION
  The kernel ships default-OFF (FLOWMAP_MBCONV_DOWN_MIN_HW gate) and is a
  recorded negative result on perf anyway (16.8 ms fwd+bwd vs 12.0 for XLA
  standalone), so there is no prize behind the fault — this repro exists so
  future kernels of the same family (large per-grid-step blocks, grid ~
  n_frames, parity-split flat layouts) can check whether the runtime still
  faults before investing in that design.

USAGE
  python scripts/probes/repro_mbconv_fault.py --yes [--frames 150] [--iters 5]

  Requires --yes because a fault WEDGES THE TPU GRANT for ~3 minutes
  (subsequent healthy dispatches report spurious Internal errors; verify
  recovery with a trivial matmul before trusting later runs). Exit 0 =
  no fault this time (expected often: it is sporadic); nonzero/killed
  worker = reproduced.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--yes", action="store_true", help="I accept ~3 min TPU wedge on fault")
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    if not args.yes:
        print(__doc__)
        print("Refusing to run without --yes (a fault wedges the TPU grant).")
        return

    os.environ["FLOWMAP_MBCONV_DOWN_MIN_HW"] = "0"  # arm the gated kernel
    os.environ.setdefault("FLOWMAP_PALLAS", "force")

    import jax
    import jax.numpy as jnp

    from flowmap_tpu.model.backbone.midas_net import _mbconv, _mbconv_init

    # s1b0 of EfficientNet-Lite3 at reference scale: the exact shape that
    # faulted in-step during round 4.
    cin, cout, expand, k = 24, 32, 6, 3
    h, w = 80, 112
    p = _mbconv_init(jax.random.PRNGKey(0), cin, cout, expand, k, fold_bn=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (args.frames, h, w, cin), jnp.bfloat16)

    fwd = jax.jit(lambda x, p: _mbconv(p, x, cin, cout, expand, 2, k))
    print(f"dispatching compiled mbconv_down fwd at n={args.frames} {h}x{w} ...", flush=True)
    for i in range(args.iters):
        t0 = time.time()
        y = fwd(x, p)
        s = float(jnp.sum(y.astype(jnp.float32)))  # host read = real sync
        print(f"  iter {i}: {time.time() - t0:.2f}s sum={s:.3f}", flush=True)
    print("no fault reproduced this run (it is sporadic at this scale).")


if __name__ == "__main__":
    main()
