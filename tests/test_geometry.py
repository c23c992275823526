"""Unit tests for the SE3/Sim3/camera/triangulation geometry core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.geometry import camera, se3, sim3, triangulate

jax.config.update("jax_enable_x64", False)


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return np.asarray(se3.quat_to_rot(jnp.asarray(q)))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 6)).astype(np.float32) * 0.5
        T = se3.exp_se3(jnp.asarray(xi))
        xi2 = se3.log_se3(T)
        np.testing.assert_allclose(xi, np.asarray(xi2), atol=1e-4)

    def test_exp_small_angle(self):
        xi = jnp.asarray([[1e-9, 0, 0, 0, 0, 1e-9], [0.0] * 6], jnp.float32)
        T = se3.exp_se3(xi)
        assert np.all(np.isfinite(np.asarray(T)))
        np.testing.assert_allclose(np.asarray(T[1]), np.eye(4), atol=1e-6)

    def test_inverse(self, rng):
        xi = rng.normal(size=(16, 6)).astype(np.float32)
        T = se3.exp_se3(jnp.asarray(xi))
        I = T @ se3.inverse(T)
        np.testing.assert_allclose(
            np.asarray(I), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5
        )

    def test_apply_matches_matmul(self, rng):
        xi = rng.normal(size=(6,)).astype(np.float32)
        T = se3.exp_se3(jnp.asarray(xi))
        p = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        q = se3.apply(T, p)
        ph = jnp.concatenate([p, jnp.ones((10, 1))], axis=-1)
        q2 = (T @ ph.T).T[:, :3]
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)

    def test_quat_roundtrip(self, rng):
        R = random_rotations(rng, 128)
        q = se3.rot_to_quat(jnp.asarray(R))
        R2 = se3.quat_to_rot(q)
        np.testing.assert_allclose(R, np.asarray(R2), atol=1e-5)

    def test_log_so3_near_pi(self):
        # rotation by ~pi around an arbitrary axis is the hard branch
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        for ang in [np.pi - 1e-3, np.pi - 1e-5, np.pi]:
            w = (axis * ang).astype(np.float32)
            R = se3.exp_so3(jnp.asarray(w))
            w2 = np.asarray(se3.log_so3(R))
            R2 = np.asarray(se3.exp_so3(jnp.asarray(w2)))
            np.testing.assert_allclose(np.asarray(R), R2, atol=1e-3)

    def test_camera_center(self, rng):
        xi = rng.normal(size=(6,)).astype(np.float32)
        Tcw = se3.exp_se3(jnp.asarray(xi))
        Ow = se3.camera_center(Tcw)
        # transforming the center into camera coords must give origin
        np.testing.assert_allclose(np.asarray(se3.apply(Tcw, Ow)), 0.0, atol=1e-5)


class TestSim3:
    def test_compose_inverse(self, rng):
        R = random_rotations(rng, 8)
        s = np.exp(rng.normal(size=8).astype(np.float32) * 0.3)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        S = sim3.make(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t))
        SI = sim3.compose(S, sim3.inverse(S))
        np.testing.assert_allclose(np.asarray(SI[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(SI[1]), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(SI[2]), 0.0, atol=1e-4)

    def test_apply_scale(self):
        S = sim3.make(jnp.asarray(2.0), jnp.eye(3), jnp.zeros(3))
        p = jnp.asarray([[1.0, 0, 0]])
        np.testing.assert_allclose(np.asarray(sim3.apply(S, p)), [[2.0, 0, 0]])

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.4
        S = sim3.exp(jnp.asarray(xi))
        xi2 = np.asarray(sim3.log(S))
        np.testing.assert_allclose(xi, xi2, atol=2e-3)

    def test_exp_identity(self):
        S = sim3.exp(jnp.zeros((7,)))
        np.testing.assert_allclose(np.asarray(S[0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(S[1]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(S[2]), 0.0, atol=1e-6)

    def test_pack_unpack(self, rng):
        R = random_rotations(rng, 4)
        s = np.exp(rng.normal(size=4).astype(np.float32) * 0.2)
        t = rng.normal(size=(4, 3)).astype(np.float32)
        S = sim3.make(jnp.asarray(s), jnp.asarray(R), jnp.asarray(t))
        S2 = sim3.unpack(sim3.pack(S))
        np.testing.assert_allclose(np.asarray(S2[0]), s, atol=1e-5)
        np.testing.assert_allclose(np.asarray(S2[1]), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(S2[2]), t, atol=1e-5)


class TestCamera:
    def make_K(self, **kw):
        cam = CameraConfig(**kw)
        return camera.Intrinsics.from_config(cam)

    def test_project_backproject(self, rng):
        K = self.make_K()
        pc = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-1, 1, 100),
                    rng.uniform(-1, 1, 100),
                    rng.uniform(0.5, 5.0, 100),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        uv = camera.project(pc, K)
        pc2 = camera.backproject(uv, pc[:, 2], K)
        np.testing.assert_allclose(np.asarray(pc), np.asarray(pc2), atol=1e-3)

    def test_undistort_roundtrip(self, rng):
        K = self.make_K(k1=-0.3, k2=0.1, p1=1e-3, p2=-1e-3)
        xn = jnp.asarray(rng.uniform(-0.4, 0.4, size=(50, 2)).astype(np.float32))
        xd = camera.distort_normalized(xn, K.dist)
        xu = camera.undistort_normalized(xd, K.dist, iters=20)
        np.testing.assert_allclose(np.asarray(xn), np.asarray(xu), atol=1e-4)

    def test_no_distortion_is_identity(self, rng):
        K = self.make_K()
        uv = jnp.asarray(rng.uniform(0, 640, size=(20, 2)).astype(np.float32))
        und = camera.undistort_pixels(uv, K)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(und), atol=1e-3)

    def test_stereo_projection(self):
        K = self.make_K(bf=40.0)
        pc = jnp.asarray([[0.0, 0.0, 2.0]])
        uvr = camera.project_stereo(pc, K)
        assert np.asarray(uvr)[0, 2] == pytest.approx(np.asarray(uvr)[0, 0] - 20.0)


class TestTriangulate:
    def test_known_points(self, rng):
        K = camera.Intrinsics.from_config(CameraConfig())
        pw = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-2, 2, 200),
                    rng.uniform(-2, 2, 200),
                    rng.uniform(3.0, 10.0, 200),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        T1 = se3.identity()
        T2 = se3.exp_se3(jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.05, 0.0], jnp.float32))
        uv1 = camera.project(se3.apply(T1, pw), K)
        uv2 = camera.project(se3.apply(T2, pw), K)
        pw2 = triangulate.triangulate_two_view(uv1, uv2, T1, T2, K)
        np.testing.assert_allclose(np.asarray(pw), np.asarray(pw2), atol=2e-2)

    def test_parallax(self):
        pw = jnp.asarray([[0.0, 0.0, 10.0]])
        c1 = jnp.asarray([0.0, 0.0, 0.0])
        c2 = jnp.asarray([1.0, 0.0, 0.0])
        cos = np.asarray(triangulate.parallax_cos(pw, c1, c2))[0]
        expected = np.cos(np.arctan2(1.0, 10.0) - 0.0)
        # angle between rays ~ atan(1/10)
        assert cos == pytest.approx(np.cos(np.arctan(0.1)), abs=1e-3)
