"""CLI driver end-to-end on a small PGM sequence."""

import json
import os

import numpy as np
import pytest

from pyfeaturetrack_tpu.cli import main
from pyfeaturetrack_tpu.utils.io import pgm_write, read_feature_table

from conftest import make_textured_image, shift_image_bilinear


@pytest.fixture(scope="module")
def pgm_frames(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    base = make_textured_image(96, 128, seed=71)
    paths = []
    for i in range(5):
        p = d / f"img{i}.pgm"
        pgm_write(p, np.floor(shift_image_bilinear(base, 0.8 * i, -0.4 * i)))
        paths.append(str(p))
    return paths


def test_cli_tracks_sequence(pgm_frames, tmp_path, capsys):
    rc = main(pgm_frames + ["--features", "25", "--out", str(tmp_path),
                            "--overlays"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == 5
    assert summary["live_last_frame"] >= 15
    ft = read_feature_table(tmp_path / "features.ft")
    assert ft.nFrames == 5 and ft.nFeatures == 25
    assert (tmp_path / "feat3.ppm").exists()
    assert (tmp_path / "features.txt").exists()


def test_cli_chunked(pgm_frames, tmp_path, capsys):
    rc = main(pgm_frames + ["--features", "20", "--out", str(tmp_path),
                            "--chunks", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["chunks"] == 2
    data = np.load(tmp_path / "tracks.npz")
    assert data["x"].shape[0] == 5


def test_reference_named_config_functions():
    import pyfeaturetrack_tpu as pft
    cfg = pft.KLTCreateTrackingContext()
    cfg2 = pft.KLTChangeTCPyramid(cfg, search_range=30)
    assert cfg2.nPyramidLevels >= cfg.nPyramidLevels
    cfg3 = pft.KLTUpdateTCBorder(cfg2)
    assert cfg3.borderx > 0
    text = pft.KLTPrintTrackingContext(cfg)
    assert "mindist" in text


def test_track_size_mismatch_raises():
    import pyfeaturetrack_tpu as pft
    from pyfeaturetrack_tpu.errors import KLTError
    cfg = pft.create_config()
    fl = pft.KLTCreateFeatureList(4)
    a = np.zeros((64, 96))
    b = np.zeros((64, 128))
    with pytest.raises(KLTError, match="size mismatch"):
        pft.KLTTrackFeatures(cfg, a, b, fl)


def test_cli_lighting_flag(pgm_frames, tmp_path, capsys):
    rc = main(pgm_frames[:3] + ["--features", "15", "--out", str(tmp_path),
                                "--lighting-insensitive"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["live_last_frame"] >= 8


def test_cli_chunked_batched(pgm_frames, tmp_path, capsys):
    rc = main(pgm_frames + ["--features", "20", "--out", str(tmp_path),
                            "--chunks", "2", "--batched"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["chunks"] == 2
    assert summary["live_last_frame"] >= 10


def test_cli_device_loop_matches_host(pgm_frames, tmp_path, capsys):
    """--device-loop produces the same table as the host loop."""
    rc = main(pgm_frames + ["--features", "20",
                            "--out", str(tmp_path / "dev"), "--device-loop"])
    assert rc == 0
    s_dev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s_dev["device_loop"] is True
    rc = main(pgm_frames + ["--features", "20",
                            "--out", str(tmp_path / "host")])
    assert rc == 0
    s_host = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s_dev["live_last_frame"] == s_host["live_last_frame"]
    assert s_dev["full_tracks"] == s_host["full_tracks"]
    ft_d = read_feature_table(tmp_path / "dev" / "features.ft")
    ft_h = read_feature_table(tmp_path / "host" / "features.ft")
    np.testing.assert_array_equal(np.asarray(ft_d.val),
                                  np.asarray(ft_h.val))
    np.testing.assert_allclose(np.asarray(ft_d.x), np.asarray(ft_h.x),
                               atol=1e-4)


def test_cli_stream_matches_device_loop(pgm_frames, tmp_path, capsys):
    """--stream (serving path: lazy PGM reads, uint8 staging) produces
    the same table as --device-loop."""
    rc = main(pgm_frames + ["--features", "20", "--chain", "2",
                            "--out", str(tmp_path / "srv"), "--stream"])
    assert rc == 0
    s_srv = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s_srv["stream"] is True
    rc = main(pgm_frames + ["--features", "20",
                            "--out", str(tmp_path / "dev"),
                            "--device-loop"])
    assert rc == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    ft_s = read_feature_table(tmp_path / "srv" / "features.ft")
    ft_d = read_feature_table(tmp_path / "dev" / "features.ft")
    np.testing.assert_array_equal(np.asarray(ft_s.val),
                                  np.asarray(ft_d.val))
    np.testing.assert_allclose(np.asarray(ft_s.x), np.asarray(ft_d.x),
                               atol=1e-4)


def test_cli_flow_mode(pgm_frames, tmp_path, capsys):
    rc = main(pgm_frames[:3] + ["--flow", "--overlays",
                                "--out", str(tmp_path)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["flow"] is True and summary["pairs"] == 2
    assert summary["mean_tracked_fraction"] > 0.3
    with np.load(tmp_path / "flow.npz") as z:
        u, v, st = z["u"], z["v"], z["status"]
    assert u.shape == (2, 96, 128) and st.dtype == np.int32
    # content drifts by (+0.8, -0.4) per frame -> flow ~(+.8, -.4)
    m = st[0] == 0
    assert abs(np.median(u[0][m]) - 0.8) < 0.1
    assert abs(np.median(v[0][m]) + 0.4) < 0.1
    assert (tmp_path / "flow1.ppm").exists()


def test_cli_flag_conflicts(pgm_frames, tmp_path):
    with pytest.raises(SystemExit):
        main(pgm_frames + ["--flow", "--vo", "--out", str(tmp_path)])
    with pytest.raises(SystemExit):  # --right without --baseline
        main(pgm_frames + ["--vo", "--fx", "260", "--right"]
             + pgm_frames + ["--out", str(tmp_path)])
    with pytest.raises(SystemExit):  # stereo flags without --vo
        main(pgm_frames + ["--right"] + pgm_frames
             + ["--baseline", "0.3", "--out", str(tmp_path)])
    with pytest.raises(SystemExit):  # count mismatch
        main(pgm_frames + ["--vo", "--fx", "260", "--baseline", "0.3",
                           "--right"] + pgm_frames[:2]
             + ["--out", str(tmp_path)])
    with pytest.raises(SystemExit):
        main(pgm_frames + ["--stream", "--device-loop",
                           "--out", str(tmp_path)])
    with pytest.raises(SystemExit):
        main(pgm_frames + ["--batched", "--out", str(tmp_path)])
    with pytest.raises(SystemExit):
        main(pgm_frames + ["--device-loop", "--chunks", "2",
                           "--out", str(tmp_path)])


def test_cli_vo_mode(tmp_path):
    """--vo: trajectory.npz + summary from a rendered 3D scene (the
    bundled flat synthetic sequence is degenerate for monocular VO)."""
    from test_vo import K as K_vo
    from test_vo import _gt_scene, _render
    Rs, ts, cs, pts = _gt_scene()
    paths = []
    for i, f in enumerate(_render(Rs, ts, pts)):
        p = tmp_path / f"f{i:02d}.pgm"
        pgm_write(p, f)
        paths.append(str(p))
    out = tmp_path / "out"
    rc = main(paths + ["--vo", "--fx", str(K_vo[0, 0]),
                       "--kf-every", "2", "--features", "120",
                       "--traj-format", "tum", "--out", str(out)])
    assert rc == 0
    z = np.load(out / "trajectory.npz")
    assert z["R"].shape[0] == z["centers"].shape[0] >= 5
    assert z["landmarks"].shape[0] >= 50
    # trajectory matches ground truth after similarity alignment
    from pyfeaturetrack_tpu.sfm.pipeline import ate_rmse_aligned
    gt = cs[z["keyframe_frames"]]
    assert ate_rmse_aligned(z["centers"], gt) < 0.05
    # TUM export round-trips the same poses
    from pyfeaturetrack_tpu.utils.trajectory import read_tum
    ts_r, R_r, _, C_r = read_tum(out / "trajectory.tum")
    np.testing.assert_array_equal(ts_r, z["keyframe_frames"])
    # quaternion round-trip re-orthonormalizes: VO's float32-refined
    # rotations carry ~1e-6 non-orthonormality the projection removes
    np.testing.assert_allclose(R_r, z["R"], atol=1e-5)
    np.testing.assert_allclose(C_r, z["centers"], atol=1e-6)


def test_cli_vo_requires_fx():
    with pytest.raises(SystemExit):
        main(["x.pgm", "--vo"])


def test_cli_traj_format_requires_vo():
    with pytest.raises(SystemExit):
        main(["x.pgm", "--traj-format", "tum"])


def test_cli_depth_mode(tmp_path, capsys):
    """--depth: dense stereo depth maps from rectified pairs (constant
    d=6 -> depth = fx * baseline / 6 on valid pixels)."""
    tex = make_textured_image(72, 140, seed=33)
    lefts, rights = [], []
    for i in range(2):
        lp = tmp_path / f"l{i}.pgm"
        rp = tmp_path / f"r{i}.pgm"
        pgm_write(lp, tex[:, :120])
        pgm_write(rp, tex[:, 6:126])
        lefts.append(str(lp))
        rights.append(str(rp))
    out = tmp_path / "out"
    rc = main(lefts + ["--depth", "--right"] + rights +
              ["--baseline", "0.5", "--fx", "120",
               "--max-disparity", "12", "--overlays", "--out", str(out)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["depth"] is True and summary["pairs"] == 2
    assert summary["mean_valid_fraction"] > 0.4
    assert abs(summary["median_depth"] - 120 * 0.5 / 6.0) < 0.2
    z = np.load(out / "depth.npz")
    assert z["depth"].shape == (2, 72, 120)
    assert (out / "disp0.ppm").exists()


def test_cli_depth_flag_validation():
    with pytest.raises(SystemExit):  # --depth without --right
        main(["x.pgm", "--depth", "--fx", "100"])
    with pytest.raises(SystemExit):  # --depth without --fx
        main(["x.pgm", "--depth", "--right", "y.pgm",
              "--baseline", "0.5"])
    with pytest.raises(SystemExit):  # --depth + --vo
        main(["x.pgm", "--depth", "--vo", "--fx", "100",
              "--right", "y.pgm", "--baseline", "0.5"])


def test_cli_subpixel_flag(pgm_frames, tmp_path, capsys):
    rc = main(pgm_frames[:3] + ["--features", "15", "--out",
                                str(tmp_path), "--subpixel"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames"] == 3
    # sub-pixel refinement moves detections off the integer grid
    ft = read_feature_table(tmp_path / "features.ft")
    x0 = np.asarray(ft.x[0])
    live = np.asarray(ft.val[0]) >= 0
    assert (np.abs(x0[live] - np.round(x0[live])) > 1e-4).any()
    with pytest.raises(SystemExit):  # host-loop-only flag
        main(pgm_frames + ["--subpixel", "--chunks", "2",
                           "--out", str(tmp_path)])
