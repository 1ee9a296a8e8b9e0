"""Trajectory formats + RPE metrics (utils/trajectory.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfeaturetrack_tpu.errors import KLTError
from pyfeaturetrack_tpu.sfm.geometry import so3_exp
from pyfeaturetrack_tpu.utils.trajectory import (quaternion_to_rotation,
                                                 read_kitti, read_tum,
                                                 rotation_to_quaternion,
                                                 rpe, write_kitti,
                                                 write_tum)


def _random_trajectory(m=12, seed=0):
    rng = np.random.default_rng(seed)
    R = np.asarray(so3_exp(jnp.asarray(
        rng.uniform(-1.5, 1.5, (m, 3)), jnp.float32)), np.float64)
    # exact float64 rotations (float32 so3_exp is only orthonormal to
    # ~1e-7, which reads as a fake ~5e-4 rad relative-rotation error)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    t = rng.uniform(-3, 3, (m, 3))
    return R, t


def test_quaternion_round_trip():
    R, _ = _random_trajectory(m=40, seed=3)
    q = rotation_to_quaternion(R)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0,
                               atol=1e-12)
    R2 = quaternion_to_rotation(q)
    np.testing.assert_allclose(R2, R, atol=1e-7)


def test_tum_round_trip(tmp_path):
    R, t = _random_trajectory()
    p = tmp_path / "traj.tum"
    write_tum(p, R, t, timestamps=10.0 + np.arange(len(R)) * 0.5)
    ts, R2, t2, C = read_tum(p)
    np.testing.assert_allclose(ts, 10.0 + np.arange(len(R)) * 0.5)
    np.testing.assert_allclose(R2, R, atol=1e-7)
    np.testing.assert_allclose(t2, t, atol=1e-6)
    # centers match the world->camera convention
    np.testing.assert_allclose(
        C, -np.einsum("kji,kj->ki", R, t), atol=1e-6)


def test_kitti_round_trip(tmp_path):
    R, t = _random_trajectory(seed=5)
    p = tmp_path / "poses.txt"
    write_kitti(p, R, t)
    R2, t2, C = read_kitti(p)
    np.testing.assert_allclose(R2, R, atol=1e-7)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_malformed_files_raise(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("1.0 2.0 3.0\n")
    with pytest.raises(KLTError):
        read_tum(bad)
    with pytest.raises(KLTError):
        read_kitti(bad)
    nan = tmp_path / "nonnum.txt"
    nan.write_text("a b c d e f g h\n")
    with pytest.raises(KLTError):
        read_tum(nan)
    empty = tmp_path / "empty.txt"
    empty.write_text("# only a comment\n")
    with pytest.raises(KLTError):
        read_tum(empty)


def test_rpe_zero_for_identical():
    R, t = _random_trajectory()
    te, re = rpe(R, t, R, t, delta=2)
    assert te.shape == (len(R) - 2,)
    assert te.max() < 1e-12 and re.max() < 1e-6


def test_rpe_detects_drift():
    R, t = _random_trajectory(seed=7)
    # estimated trajectory = gt with a constant per-frame translation
    # drift of 0.01 in the world x axis (applied to centers)
    C = -np.einsum("kji,kj->ki", R, t)
    C_d = C + np.outer(np.arange(len(R)) * 0.01, [1.0, 0, 0])
    t_d = -np.einsum("kij,kj->ki", R, C_d)
    te, re = rpe(R, t_d, R, t, delta=1)
    assert np.allclose(re, 0.0, atol=1e-6)      # rotations untouched
    np.testing.assert_allclose(te, 0.01, atol=1e-9)


def test_rpe_needs_enough_poses():
    R, t = _random_trajectory(m=3)
    with pytest.raises(KLTError):
        rpe(R, t, R, t, delta=3)
