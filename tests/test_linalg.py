"""Batched small-matrix linalg vs numpy."""

import numpy as np
import jax.numpy as jnp

from pyfeaturetrack_tpu.ops.linalg import gauss_solve_det, inv3x3


def _spd(n, p, seed):
    r = np.random.default_rng(seed)
    A = r.standard_normal((n, p, p)).astype(np.float32)
    return A @ A.transpose(0, 2, 1) + 0.1 * np.eye(p, dtype=np.float32)


def test_inv3x3_matches_numpy():
    M = _spd(50, 3, 0)
    inv, det = inv3x3(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(det), np.linalg.det(M), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(inv) @ M,
                               np.broadcast_to(np.eye(3), M.shape),
                               atol=1e-3)


def test_gauss_solve_det_matches_numpy():
    for p in (2, 4, 6):
        A = _spd(40, p, p)
        b = np.random.default_rng(p + 1).standard_normal(
            (40, p)).astype(np.float32)
        x, det = gauss_solve_det(jnp.asarray(A), jnp.asarray(b))
        want = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), want, rtol=2e-2,
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(det), np.linalg.det(A),
                                   rtol=1e-2)


def test_gauss_solve_singular_det_zeroish():
    A = np.zeros((3, 4, 4), np.float32)
    A[0] = np.eye(4)
    b = np.ones((3, 4), np.float32)
    x, det = gauss_solve_det(jnp.asarray(A), jnp.asarray(b))
    det = np.asarray(det)
    assert abs(det[0] - 1.0) < 1e-5
    assert abs(det[1]) < 1e-5 and abs(det[2]) < 1e-5
