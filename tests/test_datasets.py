"""Dataset-loader tests against generated fixtures in the real formats."""

import os

import numpy as np
import pytest

from orbslam2_tpu.io import synthetic
from orbslam2_tpu.io.datasets import EurocDataset, KittiOdometryDataset, TumRgbdDataset
from orbslam2_tpu.io import trajectory as traj


def _write_png(path, arr, mode=None):
    from PIL import Image

    Image.fromarray(arr, mode=mode).save(path)


@pytest.fixture
def tum_fixture(tmp_path, rng):
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, depth_lines = [], []
    world = synthetic.make_world(n_points=400, seed=1)
    from orbslam2_tpu.config import CameraConfig

    cam = CameraConfig(width=160, height=120, fx=120, fy=120, cx=79.5, cy=59.5)
    for i in range(4):
        t = 100.0 + i * 0.033
        img, depth = synthetic.render_frame(world, np.eye(4), cam)
        _write_png(str(root / "rgb" / f"{t:.6f}.png"), img.astype(np.uint8))
        d16 = (depth * 5000.0).astype(np.uint16)
        _write_png(str(root / "depth" / f"{t + 0.005:.6f}.png"), d16)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t + 0.005:.6f} depth/{t + 0.005:.6f}.png")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text(
        "# gt\n" + "\n".join(f"{100.0 + i * 0.033:.6f} 0 0 {i * 0.1:.3f} 0 0 0 1" for i in range(4)) + "\n"
    )
    return str(root)


class TestTum:
    def test_load_and_associate(self, tum_fixture):
        ds = TumRgbdDataset(tum_fixture)
        assert len(ds) == 4
        img, depth, t = ds[0]
        assert img.shape == (120, 160) and depth.shape == (120, 160)
        assert img.dtype == np.float32
        assert t == pytest.approx(100.0)
        # depth scaled back to meters
        assert 0 < depth[depth > 0].min() < 50

    def test_ground_truth(self, tum_fixture):
        ds = TumRgbdDataset(tum_fixture)
        ts, poses = ds.ground_truth()
        assert poses.shape == (4, 4, 4)
        # camera moves +z in world => Tcw translation is -z
        np.testing.assert_allclose(poses[1][2, 3], -0.1, atol=1e-6)


class TestKitti:
    def test_load(self, tmp_path, rng):
        root = tmp_path / "kitti"
        (root / "image_0").mkdir(parents=True)
        (root / "image_1").mkdir()
        for i in range(3):
            for d in ("image_0", "image_1"):
                arr = rng.integers(0, 255, (40, 60), dtype=np.uint8)
                _write_png(str(root / d / f"{i:06d}.png"), arr)
        (root / "times.txt").write_text("".join(f"{i * 0.1:.6e}\n" for i in range(3)))
        ds = KittiOdometryDataset(str(root))
        assert len(ds) == 3
        l, r, t = ds[1]
        assert l.shape == (40, 60) and r.shape == (40, 60)
        assert t == pytest.approx(0.1)


class TestEuroc:
    def test_load(self, tmp_path, rng):
        root = tmp_path / "euroc"
        for cam in ("cam0", "cam1"):
            d = root / "mav0" / cam / "data"
            d.mkdir(parents=True)
            lines = ["#timestamp [ns],filename"]
            for i in range(3):
                ts = 1403636579763555584 + i * 50000000
                arr = rng.integers(0, 255, (30, 40), dtype=np.uint8)
                _write_png(str(d / f"{ts}.png"), arr)
                lines.append(f"{ts},{ts}.png")
            (root / "mav0" / cam / "data.csv").write_text("\n".join(lines) + "\n")
        ds = EurocDataset(str(root))
        assert len(ds) == 3
        l, r, t = ds[0]
        assert l.shape == (30, 40)
        assert t == pytest.approx(1403636579.763555584, abs=1e-3)


class TestTrajectoryRoundtrip:
    def test_tum_save_load(self, tmp_path, rng):
        from orbslam2_tpu.geometry import se3
        import jax.numpy as jnp

        poses = np.stack([
            np.asarray(se3.exp_se3(jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32))))
            for _ in range(5)
        ])
        ts = np.arange(5, dtype=np.float64)
        path = str(tmp_path / "traj.txt")
        traj.save_tum(path, ts, poses)
        ts2, poses2 = traj.load_tum(path)
        np.testing.assert_allclose(ts, ts2, atol=1e-6)
        np.testing.assert_allclose(poses, poses2, atol=1e-4)


@pytest.mark.slow
def test_tum_directory_end_to_end(tmp_path):
    """Full real-dataset path: render the textured room, WRITE it to disk in
    the actual TUM RGB-D layout (uint16 depth at 5000 counts/m, rgb/depth
    list files, YAML settings with DepthMapFactor), then drive the CLI
    runner over the directory and gate the resulting trajectory's ATE.
    Covers PNG decode (native/PIL), timestamp association, the
    apply-DepthMapFactor-exactly-once contract (round-1 advisor found it
    applied twice), YAML parsing, and trajectory export — everything a TUM
    benchmark run would use except the downloaded tarball."""
    from orbslam2_tpu.config import CameraConfig
    from orbslam2_tpu.io import trajectory as traj_io
    from orbslam2_tpu.run import main as run_main
    from orbslam2_tpu.utils.evaluation import ate_rmse

    cam = CameraConfig(fx=240.0, fy=240.0, cx=159.5, cy=119.5, bf=24.0,
                       fps=30.0, width=320, height=240)
    n = 14
    seq = synthetic.textured_sequence(n_frames=n, kind="forward", cam=cam)
    root = tmp_path / "tum_seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        t = 1000.0 + i / 30.0
        img, depth = seq.frame(i)
        _write_png(str(root / "rgb" / f"{t:.6f}.png"),
                   np.clip(img, 0, 255).astype(np.uint8))
        _write_png(str(root / "depth" / f"{t:.6f}.png"),
                   (depth * 5000.0).astype(np.uint16))
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    yaml = root / "settings.yaml"
    yaml.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 240.0\nCamera.fy: 240.0\nCamera.cx: 159.5\nCamera.cy: 119.5\n"
        "Camera.bf: 24.0\nCamera.fps: 30.0\nCamera.width: 320\nCamera.height: 240\n"
        "ORBextractor.nFeatures: 500\n"
        "ThDepth: 40.0\nDepthMapFactor: 5000.0\n"
    )
    out = str(tmp_path / "traj.txt")
    rc = run_main([
        "--dataset", "tum", "--root", str(root), "--settings", str(yaml),
        "--out", out,
    ])
    assert rc == 0
    ts, poses = traj_io.load_tum(out)
    assert len(ts) >= n - 1  # at most one untracked frame
    idx = np.round((np.asarray(ts) - 1000.0) * 30.0).astype(int)
    rmse = ate_rmse(poses, seq.poses[idx], align=True)
    assert rmse < 0.05, rmse
