"""Tests for the SVD-free weighted Kabsch solver.

Oracle: the reference's SVD formulation (`flowmap/model/procrustes.py:7-51`)
re-derived in NumPy, including the det-sign reflection fix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowmap_tpu.ops.procrustes import align_rigid, quaternion_to_matrix


def svd_align_rigid(p, q, w):
    """Reference semantics in NumPy (float64)."""
    wn = w / (w.sum(-1, keepdims=True) + 1e-8)
    pc = (wn[..., None] * p).sum(-2)
    qc = (wn[..., None] * q).sum(-2)
    P = p - pc[..., None, :]
    Q = q - qc[..., None, :]
    m = np.einsum("...ni,...nj->...ij", Q * w[..., None], P)
    u, _, vt = np.linalg.svd(m)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    s = np.broadcast_to(np.eye(3), m.shape).copy()
    s[..., 2, 2] = d
    r = u @ s @ vt
    t = qc - np.einsum("...ij,...j->...i", r, pc)
    out = np.broadcast_to(np.eye(4), (*m.shape[:-2], 4, 4)).copy()
    out[..., :3, :3] = r
    out[..., :3, 3] = t
    return out


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(quaternion_to_matrix(jnp.asarray(q)))


class TestAlignRigid:
    def test_exact_recovery(self):
        """Noise-free correspondences recover the true transform."""
        rng = np.random.default_rng(0)
        r = random_rotation(rng)
        t = rng.normal(size=3)
        p = rng.normal(size=(100, 3))
        q = p @ r.T + t
        w = rng.uniform(0.2, 1.0, size=100)
        got = np.asarray(
            align_rigid(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w))
        )
        np.testing.assert_allclose(got[:3, :3], r, atol=1e-5)
        np.testing.assert_allclose(got[:3, 3], t, atol=1e-5)

    def test_matches_svd_oracle_noisy(self):
        """With noise the optimum is nontrivial; must match SVD-Kabsch."""
        rng = np.random.default_rng(1)
        batch = 16
        p = rng.normal(size=(batch, 64, 3))
        r = np.stack([random_rotation(rng) for _ in range(batch)])
        t = rng.normal(size=(batch, 1, 3))
        q = np.einsum("bij,bnj->bni", r, p) + t + 0.05 * rng.normal(size=p.shape)
        w = rng.uniform(0.05, 1.0, size=(batch, 64))
        want = svd_align_rigid(p, q, w)
        got = np.asarray(
            align_rigid(
                jnp.asarray(p, dtype=jnp.float32),
                jnp.asarray(q, dtype=jnp.float32),
                jnp.asarray(w, dtype=jnp.float32),
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_is_proper_rotation(self):
        rng = np.random.default_rng(2)
        p = rng.normal(size=(8, 32, 3))
        q = rng.normal(size=(8, 32, 3))  # unrelated points: hard case
        w = np.ones((8, 32))
        got = np.asarray(align_rigid(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w)))
        r = got[..., :3, :3]
        np.testing.assert_allclose(
            np.einsum("...ij,...kj->...ik", r, r),
            np.broadcast_to(np.eye(3), r.shape),
            atol=1e-5,
        )
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)

    def test_near_planar_points(self):
        """Degenerate-ish (planar) configurations still give the SVD optimum."""
        rng = np.random.default_rng(3)
        p = rng.normal(size=(40, 3))
        p[:, 2] *= 1e-3  # nearly planar
        r = random_rotation(rng)
        q = p @ r.T + 0.01 * rng.normal(size=p.shape)
        w = np.ones(40)
        want = svd_align_rigid(p, q, w)
        got = np.asarray(align_rigid(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_gradient_matches_finite_difference(self):
        """The loss backpropagates through R every step (SURVEY §7.3 #1)."""
        rng = np.random.default_rng(4)
        p0 = rng.normal(size=(32, 3)).astype(np.float32)
        r = random_rotation(rng)
        q0 = (p0 @ r.T + rng.normal(size=3) + 0.1 * rng.normal(size=p0.shape)).astype(
            np.float32
        )
        w0 = np.ones(32, np.float32)
        target = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))

        def loss(p):
            tf = align_rigid(p, jnp.asarray(q0), jnp.asarray(w0))
            return jnp.sum((tf - target) ** 2)

        g = jax.grad(loss)(jnp.asarray(p0))
        assert bool(jnp.all(jnp.isfinite(g)))
        eps = 1e-3
        for idx in [(0, 0), (5, 1), (17, 2)]:
            d = np.zeros_like(p0)
            d[idx] = eps
            num = (loss(jnp.asarray(p0 + d)) - loss(jnp.asarray(p0 - d))) / (2 * eps)
            np.testing.assert_allclose(
                float(num), float(g[idx]), rtol=5e-2, atol=5e-3
            )

    def test_batched_vmap(self):
        """vmap over a candidate axis (the softmin intrinsics pattern)."""
        rng = np.random.default_rng(5)
        p = jnp.asarray(rng.normal(size=(60, 2, 128, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(60, 2, 128, 3)).astype(np.float32))
        w = jnp.ones((60, 2, 128), jnp.float32)
        out = align_rigid(p, q, w)
        assert out.shape == (60, 2, 4, 4)
        assert bool(jnp.all(jnp.isfinite(out)))
