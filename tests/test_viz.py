"""Viz renderers: frame overlay and map render produce sane images."""

import numpy as np

from orbslam2_tpu.config import SlamConfig
from orbslam2_tpu.viz.drawers import FrameDrawer, MapDrawer


class TestDrawers:
    def test_frame_drawer(self, rng):
        cfg = SlamConfig()
        img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
        xy = rng.uniform(10, 100, (30, 2)).astype(np.float32)
        tracked = rng.uniform(0, 1, 30) > 0.5
        out = FrameDrawer(cfg).draw(img, xy, tracked, state_text="OK KFs:3")
        assert out.size == (160, 120)
        arr = np.asarray(out)
        assert arr.shape == (120, 160, 3)
        # green tracked markers present
        assert ((arr[..., 1] > 200) & (arr[..., 0] < 50)).any()

    def test_map_drawer(self, rng):
        cfg = SlamConfig()
        P, K = 200, 4
        mp = rng.uniform(-3, 3, (P, 3)).astype(np.float32)
        valid = np.ones(P, bool)
        kf = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        kf[:, 0, 3] = np.arange(K) * 0.5
        kfv = np.ones(K, bool)
        covis = np.full((K, K), 150, np.int32)
        parent = np.asarray([-1, 0, 1, 2], np.int32)
        out = MapDrawer(cfg, size=256).draw(
            mp, valid, kf, kfv, covis=covis, kf_parent=parent,
            current_Tcw=np.eye(4),
        )
        arr = np.asarray(out)
        assert arr.shape == (256, 256, 3)
        # map points drawn (dark pixels on white)
        assert (arr.sum(-1) < 200).any()
        # keyframe boxes in blue and camera in red
        assert ((arr[..., 2] > 200) & (arr[..., 0] < 100)).any()
        assert ((arr[..., 0] > 200) & (arr[..., 2] < 100)).any()

    def test_map_drawer_empty(self):
        cfg = SlamConfig()
        out = MapDrawer(cfg, size=64).draw(
            np.zeros((10, 3)), np.zeros(10, bool),
            np.tile(np.eye(4), (2, 1, 1)), np.zeros(2, bool),
        )
        assert np.asarray(out).shape == (64, 64, 3)
