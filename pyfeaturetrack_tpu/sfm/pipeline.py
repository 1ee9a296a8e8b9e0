"""Tracker -> SfM glue: feature tables to bundle-adjusted reconstructions.

The full front-end of BASELINE.md config 5: KLT tracks (FeatureTable) ->
observation set -> DLT triangulation from initial poses -> (optionally
landmark-sharded) Schur-complement bundle adjustment -> refined poses +
landmarks, with an ATE metric against ground truth.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ba import BAProblem, bundle_adjust, pad_problem_for_mesh
from .triangulate import triangulate_dlt


def observations_from_feature_table(ft, min_track_len: int = 2,
                                    return_runs: bool = False):
    """FeatureTable -> (cam_idx, pt_idx, uv, w) observation arrays.

    Landmark identity is a maximal contiguous live RUN of a feature
    column (ba_windowed.column_runs): a slot that is lost and refilled by
    replace-lost holds two different physical landmarks and yields two
    landmark indices. Runs shorter than ``min_track_len`` keep their
    observations but are weighted out.
    """
    from .ba_windowed import column_runs
    x = np.asarray(ft.x, np.float64)
    y = np.asarray(ft.y, np.float64)
    runs = column_runs(ft)
    frames, feats, pts, w = [], [], [], []
    for li, (j, s, ln) in enumerate(runs):
        frames.extend(range(s, s + ln))
        feats.extend([j] * ln)
        pts.extend([li] * ln)
        w.extend([1.0 if ln >= min_track_len else 0.0] * ln)
    frames = np.asarray(frames, np.int32)
    feats = np.asarray(feats, np.int32)
    uv = np.stack([x[frames, feats], y[frames, feats]], axis=-1)
    out = (frames, np.asarray(pts, np.int32),
           uv.astype(np.float32), np.asarray(w, np.float32))
    return out + (runs,) if return_runs else out


def initial_landmarks(K, Rs, ts, ft, min_track_len: int = 2, runs=None):
    """DLT-triangulate every landmark run from the given initial poses."""
    from .ba_windowed import column_runs
    if runs is None:
        runs = column_runs(ft)
    x = np.asarray(ft.x, np.float64)
    y = np.asarray(ft.y, np.float64)
    C = np.asarray(Rs).shape[0]
    L = len(runs)
    uvs = np.zeros((L, C, 2), np.float64)
    mask = np.zeros((L, C), bool)
    for li, (j, s, ln) in enumerate(runs):
        uvs[li, s:s + ln, 0] = x[s:s + ln, j]
        uvs[li, s:s + ln, 1] = y[s:s + ln, j]
        mask[li, s:s + ln] = True
    X = triangulate_dlt(jnp.asarray(K, jnp.float32),
                        jnp.asarray(Rs, jnp.float32),
                        jnp.asarray(ts, jnp.float32),
                        jnp.asarray(uvs, jnp.float32),
                        jnp.asarray(mask))
    return X


def run_sfm(ft, K, R0, t0, n_iters: int = 15, damping: float = 1e-3,
            min_track_len: int = 2, mesh=None,
            huber_delta: float | None = None,
            max_init_reproj_error: float | None = None):
    """Full back-end pass over a feature table.

    Returns dict with refined (R, t, X), per-iteration costs, and the
    observation count. ``mesh`` enables landmark-sharded distributed BA.
    ``huber_delta`` enables robust (IRLS Huber) reweighting;
    ``max_init_reproj_error`` gates out observations whose reprojection
    error under the INITIAL poses/triangulation exceeds the threshold
    (outlier tracks — e.g. features locked onto geometry-violating image
    structure — would otherwise dominate the quadratic cost).
    """
    cam_idx, pt_idx, uv, w, runs = observations_from_feature_table(
        ft, min_track_len, return_runs=True)
    X0 = initial_landmarks(K, R0, t0, ft, min_track_len, runs=runs)
    # Degenerate triangulations (short zero-weighted runs, but also
    # full-weight runs with no parallax / epipole geometry) come back
    # non-finite: park them at a finite dummy AND zero their
    # observations' weights — a NaN Jacobian (NaN * w=0 = NaN) would
    # poison the camera-block sums, and keeping w=1 on a dummy point
    # would silently bias the solve.
    finite = np.isfinite(np.asarray(X0)).all(axis=-1)
    X0 = jnp.where(jnp.asarray(finite)[:, None], X0,
                   jnp.asarray([0.0, 0.0, 1.0], X0.dtype))
    w = w * finite[pt_idx]

    if max_init_reproj_error is not None:
        from .geometry import project
        import jax
        uv_hat, depth = jax.vmap(
            lambda c, p: project(jnp.asarray(K, jnp.float32),
                                 jnp.asarray(R0, jnp.float32)[c],
                                 jnp.asarray(t0, jnp.float32)[c],
                                 X0[p]))(jnp.asarray(cam_idx),
                                         jnp.asarray(pt_idx))
        err = np.linalg.norm(np.asarray(uv_hat) - uv, axis=-1)
        ok = (err <= max_init_reproj_error) & (np.asarray(depth) > 0)
        w = w * ok.astype(np.float32)

    problem = BAProblem(K=jnp.asarray(K, jnp.float32),
                        cam_idx=jnp.asarray(cam_idx),
                        pt_idx=jnp.asarray(pt_idx),
                        uv=jnp.asarray(uv),
                        w=jnp.asarray(w))

    n_points = int(X0.shape[0])
    if mesh is not None:
        n_dev = mesh.devices.size
        problem, l_pad, _ = pad_problem_for_mesh(problem, n_points, n_dev)
        if l_pad:
            X0 = jnp.concatenate(
                [X0, jnp.ones((l_pad, 3), X0.dtype)], axis=0)

    R, t, X, costs = bundle_adjust(problem, R0, t0, X0, n_iters=n_iters,
                                   damping=damping, mesh=mesh,
                                   huber_delta=huber_delta)
    if mesh is not None and n_points != X.shape[0]:
        X = X[:n_points]
    return {"R": R, "t": t, "X": X, "costs": costs,
            "n_observations": int((np.asarray(w) > 0).sum())}


def run_sfm_windowed(ft, K, R0, t0, n_iters: int = 15,
                     damping: float = 1e-3, min_track_len: int = 3,
                     huber_delta: float | None = 3.0,
                     max_init_reproj_error: float | None = 20.0,
                     point_only_iters: int = 3, solver: str = "dense",
                     precond_block: int = 1):
    """Windowed block-sparse back-end pass (the production-scale path).

    Splits the table into contiguous track runs (a refilled slot is a new
    landmark), triangulates each run, gates geometry-violating
    observations, warm-starts with camera-frozen point refinements, then
    runs robust windowed BA. On a tracked-with-replacement table this
    recipe measured ATE 26.7 -> 6.2 mm vs the dense path's 9.5 mm.
    """
    from .ba_windowed import (WindowedBAProblem, bundle_adjust_windowed,
                              gate_windowed, triangulate_windowed,
                              windowed_from_feature_table)
    c0, uv, w, runs = windowed_from_feature_table(ft, min_track_len)
    X0 = triangulate_windowed(K, R0, t0, c0, uv, w)
    problem = WindowedBAProblem(K=jnp.asarray(K, jnp.float32),
                                c0=jnp.asarray(c0), uv=jnp.asarray(uv),
                                w=jnp.asarray(w))
    if max_init_reproj_error is not None:
        problem = gate_windowed(problem, R0, t0, X0, max_init_reproj_error)
    R, t, X, costs = bundle_adjust_windowed(
        problem, R0, t0, X0, n_iters=n_iters, damping=damping,
        huber_delta=huber_delta, point_only_iters=point_only_iters,
        solver=solver, precond_block=precond_block)
    return {"R": R, "t": t, "X": X, "costs": costs, "runs": runs,
            "n_observations": int((np.asarray(w) > 0).sum())}


def ate_rmse(t_est, t_gt) -> float:
    """Absolute trajectory error (RMSE over camera centers), evaluated in
    the shared gauge (camera 0 pinned by the BA)."""
    e = np.asarray(t_est, np.float64) - np.asarray(t_gt, np.float64)
    return float(np.sqrt((e * e).sum(axis=-1).mean()))


def umeyama_align(src: np.ndarray, dst: np.ndarray,
                  with_scale: bool = True) -> np.ndarray:
    """Similarity-align trajectory ``src`` onto ``dst`` (Umeyama) and
    return the transformed src. Standard for monocular ATE, where global
    scale (and gauge) are unobservable."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (sc * sc).sum() / src.shape[0]
        s = float((D * S.diagonal()).sum() / max(var_s, 1e-12))
    else:
        s = 1.0
    return (s * (R @ sc.T)).T + mu_d


def ate_rmse_aligned(t_est, t_gt) -> float:
    """ATE after similarity alignment (monocular convention)."""
    return ate_rmse(umeyama_align(t_est, t_gt), t_gt)
