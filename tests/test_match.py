"""Matcher + stereo tests on rendered synthetic frames with ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import CameraConfig, OrbConfig
from orbslam2_tpu.geometry import camera as cam_geo
from orbslam2_tpu.geometry import se3
from orbslam2_tpu.io import synthetic
from orbslam2_tpu.ops import match, orb, pyramid, stereo

CFG = OrbConfig(num_features=600, feature_slots=640, candidates_per_level=2048)
CAM = CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0)


@pytest.fixture(scope="module")
def scene():
    world = synthetic.make_world(n_points=2500, seed=3)
    T0 = np.eye(4)
    T1 = np.asarray(
        synthetic._make_se3(
            np.asarray(
                [[np.cos(0.02), 0, np.sin(0.02)], [0, 1, 0], [-np.sin(0.02), 0, np.cos(0.02)]]
            ),
            [0.08, 0.02, 0.1],
        )
    )
    img0, depth0 = synthetic.render_frame(world, T0, CAM, seed=0)
    img1, _ = synthetic.render_frame(world, T1, CAM, seed=1)
    f0 = orb.extract(jnp.asarray(img0), CFG)
    f1 = orb.extract(jnp.asarray(img1), CFG)
    return world, T0, T1, img0, depth0, img1, f0, f1


def gt_reproject(xy, depth_map, T0, T1, n_slots):
    """Project frame-0 keypoints into frame 1 using GT depth/poses."""
    K = cam_geo.Intrinsics.from_config(CAM)
    ix = np.clip(np.round(np.asarray(xy[:, 0])).astype(int), 0, CAM.width - 1)
    iy = np.clip(np.round(np.asarray(xy[:, 1])).astype(int), 0, CAM.height - 1)
    d = depth_map[iy, ix]
    pc0 = np.asarray(cam_geo.backproject(jnp.asarray(xy), jnp.asarray(d), K))
    T = jnp.asarray((T1 @ np.linalg.inv(T0)).astype(np.float32))
    pc1 = np.asarray(se3.apply(T, jnp.asarray(pc0)))
    uv1 = np.asarray(cam_geo.project(jnp.asarray(pc1), K))
    return uv1, d


class TestBruteMatch:
    def test_two_frame_match_quality(self, scene):
        world, T0, T1, img0, depth0, img1, f0, f1 = scene
        res = match.search_brute(
            f0.desc, f0.valid, f0.angle, f1.desc, f1.valid, f1.angle,
            max_dist=64, ratio=0.8,
        )
        m = np.asarray(res.best_idx)
        ok = m >= 0
        n_matches = ok.sum()
        assert n_matches > 60, n_matches

        uv1_gt, d = gt_reproject(np.asarray(f0.xy), depth0, T0, T1, CFG.feature_slots)
        has_depth = d > 0
        sel = ok & has_depth
        err = np.linalg.norm(uv1_gt[sel] - np.asarray(f1.xy)[m[sel]], axis=1)
        frac_good = (err < 3.0).mean()
        assert frac_good > 0.7, (frac_good, np.median(err))

    def test_assignment_consistency(self, scene):
        *_, f0, f1 = scene
        res = match.search_brute(
            f0.desc, f0.valid, f0.angle, f1.desc, f1.valid, f1.angle,
            max_dist=64, ratio=0.8,
        )
        best = np.asarray(res.best_idx)
        assigned = np.asarray(res.assigned)
        # bijectivity: each matched B slot points back at its unique A
        for a, b in enumerate(best):
            if b >= 0:
                assert assigned[b] == a
        matched_bs = best[best >= 0]
        assert len(matched_bs) == len(set(matched_bs.tolist()))


class TestProjectionSearch:
    def test_projection_recovers_points(self, scene):
        world, T0, T1, img0, depth0, img1, f0, f1 = scene
        # build pseudo map points from frame-0 keypoints with GT depth
        uv1_gt, d = gt_reproject(np.asarray(f0.xy), depth0, T0, T1, CFG.feature_slots)
        valid_pts = jnp.asarray((d > 0) & np.asarray(f0.valid))
        res = match.search_by_projection(
            f0.desc,
            jnp.asarray(uv1_gt.astype(np.float32)),
            f0.octave,
            valid_pts,
            f1.desc,
            f1.xy,
            f1.octave,
            f1.valid,
            radius=jnp.full(CFG.feature_slots, 6.0),
            max_dist=80,
            ratio=0.9,
        )
        m = np.asarray(res.best_idx)
        ok = m >= 0
        assert ok.sum() > 100, ok.sum()
        err = np.linalg.norm(uv1_gt[ok] - np.asarray(f1.xy)[m[ok]], axis=1)
        assert np.median(err) < 2.0, np.median(err)


class TestRotationConsistency:
    def test_filters_inconsistent(self):
        n = 64
        ang_a = jnp.zeros(n)
        # most matches rotated by 0.5 rad, a few outliers at 2.5 rad
        ang_b = jnp.asarray(np.where(np.arange(n) < 8, 2.5, 0.5).astype(np.float32))
        best_idx = jnp.arange(n, dtype=jnp.int32)
        ok = jnp.ones(n, bool)
        kept = np.asarray(match.rotation_consistency_mask(ang_a, ang_b, best_idx, ok))
        assert kept[8:].all()
        # the 8 outliers land in a non-top bin... with 3 admitted bins and
        # only 2 populated, outliers may survive; force check via histogram:
        # dominant bin (56 entries) is admitted, outlier bin (8) passes the
        # 0.1 factor? 8 > 0.1*56 -> yes, reference would keep them too.
        assert kept.sum() == n

    def test_small_outlier_bin_dropped(self):
        n = 200
        ang_a = jnp.zeros(n)
        ang_b = jnp.asarray(np.where(np.arange(n) < 5, 2.5, 0.5).astype(np.float32))
        best_idx = jnp.arange(n, dtype=jnp.int32)
        ok = jnp.ones(n, bool)
        kept = np.asarray(match.rotation_consistency_mask(ang_a, ang_b, best_idx, ok))
        # 5 < 0.1 * 195 -> outlier bin rejected
        assert not kept[:5].any()
        assert kept[5:].all()


class TestStereo:
    def test_stereo_depth_accuracy(self):
        world = synthetic.make_world(n_points=2500, seed=4)
        T = np.eye(4)
        left, right, depth_gt = synthetic.stereo_pair(world, T, CAM, seed=0)
        fl = orb.extract(jnp.asarray(left), CFG)
        fr = orb.extract(jnp.asarray(right), CFG)
        scale_factors = jnp.asarray(pyramid.level_scales(CFG), jnp.float32)
        lv_l = pyramid.build_pyramid(jnp.asarray(left), CFG)
        lv_r = pyramid.build_pyramid(jnp.asarray(right), CFG)
        sm = stereo.compute_stereo_matches(
            fl.xy, fl.octave, fl.desc, fl.valid,
            fr.xy, fr.octave, fr.desc, fr.valid,
            lv_l, lv_r, scale_factors,
            jnp.float32(CAM.bf), jnp.float32(CAM.fx),
        )
        d = np.asarray(sm.depth)
        ok = d > 0
        assert ok.sum() > 100, ok.sum()
        ix = np.clip(np.round(np.asarray(fl.xy[:, 0])).astype(int), 0, CAM.width - 1)
        iy = np.clip(np.round(np.asarray(fl.xy[:, 1])).astype(int), 0, CAM.height - 1)
        gt = depth_gt[iy, ix]
        sel = ok & (gt > 0)
        rel = np.abs(d - gt) / np.maximum(gt, 1e-6)
        # disparity is refined at the keypoint's octave level (like the
        # reference, src/Frame.cc:601-659), so precision degrades with
        # octave; gate the fine octaves tightly and the whole set loosely
        fine = sel & (np.asarray(fl.octave) <= 2)
        assert fine.sum() > 80, fine.sum()
        assert np.median(rel[fine]) < 0.06, np.median(rel[fine])
        assert np.median(rel[sel]) < 0.12, np.median(rel[sel])

    def test_rgbd_virtual_right(self):
        depth_map = np.full((480, 640), 2.0, np.float32)
        xy = jnp.asarray([[100.0, 100.0], [200.0, 50.0]])
        valid = jnp.asarray([True, True])
        sm = stereo.compute_stereo_from_rgbd(
            xy, xy, valid, jnp.asarray(depth_map), jnp.float32(1.0), jnp.float32(48.0)
        )
        np.testing.assert_allclose(np.asarray(sm.depth), [2.0, 2.0])
        np.testing.assert_allclose(np.asarray(sm.u_right), [100.0 - 24.0, 200.0 - 24.0])
