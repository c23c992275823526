"""Synthetic SLAM sequences with exact ground truth.

The reference fork ships no datasets or tests; its de-facto harness is
TUM/KITTI sequences (SURVEY.md §4). This container has no datasets either,
so we render our own: a random 3D "starfield" of high-contrast textured
blobs, a parameterized camera trajectory, and pinhole projection with
z-buffering — giving pixel-accurate ground-truth poses and depth for every
frame. Pure numpy (host-side fixture generation, not a hot path).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np

from orbslam2_tpu.config import CameraConfig


@dataclasses.dataclass
class SyntheticWorld:
    points: np.ndarray       # [P, 3] world coords
    intensity: np.ndarray    # [P] blob peak intensity
    pattern: np.ndarray      # [P, S, S] per-point texture stamp
    background: float = 18.0


def make_world(
    n_points: int = 3000,
    extent: tuple[float, float, float] = (14.0, 10.0, 10.0),
    z_offset: float = 2.0,
    stamp: int = 7,
    seed: int = 0,
) -> SyntheticWorld:
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, size=(n_points, 3)) * np.asarray(extent)
    pts[:, 2] += z_offset + extent[2] / 2.0
    intensity = rng.uniform(80.0, 255.0, size=n_points)
    # distinctive per-point stamps so descriptors are discriminative
    pattern = rng.uniform(0.35, 1.0, size=(n_points, stamp, stamp))
    pattern *= (rng.uniform(0, 1, size=(n_points, stamp, stamp)) > 0.35)
    mid = stamp // 2
    pattern[:, mid, mid] = 1.0
    return SyntheticWorld(points=pts, intensity=intensity, pattern=pattern)


def _bilinear_shift(stamps: np.ndarray, fv: np.ndarray, fu: np.ndarray) -> np.ndarray:
    """Shift each stamp [P, S, S] by its fractional (fv, fu) in [-0.5, 0.5]
    via bilinear resampling (vectorized over all stamps)."""
    P, S, _ = stamps.shape
    if P == 0:
        return stamps
    padded = np.pad(stamps, ((0, 0), (1, 1), (1, 1)))
    gy = 1.0 - fv  # sample row offset for output row y: y + gy
    gx = 1.0 - fu
    oy = np.floor(gy).astype(np.int64)
    ox = np.floor(gx).astype(np.int64)
    wy = (gy - oy)[:, None, None]
    wx = (gx - ox)[:, None, None]
    Y, X = np.mgrid[0:S, 0:S]
    pi = np.arange(P)[:, None, None]
    out = np.zeros_like(stamps)
    for dy, wgy in ((0, 1.0 - wy), (1, wy)):
        for dx, wgx in ((0, 1.0 - wx), (1, wx)):
            out += wgy * wgx * padded[pi, Y + oy[:, None, None] + dy, X + ox[:, None, None] + dx]
    return out


def _resize_stamps(stamps: np.ndarray, size: int) -> np.ndarray:
    """Bilinear-resize [N, S, S] -> [N, size, size] (vectorized)."""
    N, S, _ = stamps.shape
    if size == S:
        return stamps
    g = (np.arange(size) + 0.5) * S / size - 0.5
    g = np.clip(g, 0, S - 1)
    i0 = np.floor(g).astype(np.int64)
    i1 = np.minimum(i0 + 1, S - 1)
    w = (g - i0)[None, :]
    rows = stamps[:, i0, :] * (1 - w[..., None]) + stamps[:, i1, :] * w[..., None]
    out = rows[:, :, i0] * (1 - w[:, None, :]) + rows[:, :, i1] * w[:, None, :]
    return out


def render_frame(
    world: SyntheticWorld,
    Tcw: np.ndarray,
    cam: CameraConfig,
    noise: float = 0.0,
    seed: int = 0,
    blob_size_m: float = 0.08,
) -> tuple[np.ndarray, np.ndarray]:
    """Render (image [H, W] float32, depth [H, W] float32; 0 = no depth).

    Z-buffered, PERSPECTIVE-CORRECT stamp splatting: each point is a flat
    blob of physical size `blob_size_m`, so its pixel footprint scales with
    f/z. (Constant-pixel-size stamps would make detected blob corners carry
    a fixed pixel offset while the backprojected 3-D corner's projection
    scales with 1/z — a systematic radial bias that corrupts pose
    optimization during dolly motion.) Sub-pixel placement via bilinear
    shifting keeps disparity/flow truth below 0.1 px.
    """
    H, W = cam.height, cam.width
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = world.points @ R.T + t
    z = pc[:, 2]
    vis = z > 0.3
    u = cam.fx * pc[:, 0] / np.maximum(z, 1e-6) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 1e-6) + cam.cy
    # per-point pixel size (odd, 3..31)
    # clipping the pixel size would silently break perspective scaling (a
    # fixed-pixel-size blob biases pose estimation during dolly motion), so
    # keep the world's depth range and blob size inside the representable band
    px = cam.fx * blob_size_m / np.maximum(z, 1e-6)
    sizes = np.clip((np.round((px - 1) / 2) * 2 + 1).astype(np.int64), 3, 63)
    iu_all = np.round(u).astype(np.int64)
    iv_all = np.round(v).astype(np.int64)
    half_all = sizes // 2
    vis &= (
        (iu_all >= half_all) & (iu_all < W - half_all)
        & (iv_all >= half_all) & (iv_all < H - half_all)
    )

    image = np.full((H, W), world.background, np.float32)
    depth = np.zeros((H, W), np.float32)

    idx = np.nonzero(vis)[0]
    idx = idx[np.argsort(-z[idx])]  # far to near: near overwrites
    iu, iv = iu_all, iv_all
    # group by stamp size for vectorized resize+shift
    order_in_draw = {i: n for n, i in enumerate(idx)}
    stamps_shifted: dict[int, np.ndarray] = {}
    group_pos: dict[int, dict[int, int]] = {}
    for s in np.unique(sizes[idx]):
        sel = idx[sizes[idx] == s]
        resized = _resize_stamps(world.pattern[sel], int(s))
        shifted = _bilinear_shift(resized, (v[sel] - iv[sel]), (u[sel] - iu[sel]))
        stamps_shifted[int(s)] = shifted
        group_pos[int(s)] = {int(i): n for n, i in enumerate(sel)}
    for i in idx:
        s = int(sizes[i])
        half = s // 2
        stamp = stamps_shifted[s][group_pos[s][int(i)]] * world.intensity[i]
        y0, x0 = iv[i] - half, iu[i] - half
        region = image[y0 : y0 + s, x0 : x0 + s]
        np.maximum(region, stamp, out=region)
        mask = stamps_shifted[s][group_pos[s][int(i)]] > 0.01
        depth[y0 : y0 + s, x0 : x0 + s][mask] = z[i]

    if noise > 0:
        rng = np.random.default_rng(seed)
        image = image + rng.normal(0, noise, size=image.shape)
    return np.clip(image, 0, 255).astype(np.float32), depth


def stereo_pair(
    world: SyntheticWorld, Tcw: np.ndarray, cam: CameraConfig, **kw
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(left image, right image, left depth) for a rectified pair with
    baseline bf/fx along +x."""
    left, depth = render_frame(world, Tcw, cam, **kw)
    T_rl = np.eye(4)
    T_rl[0, 3] = -cam.baseline  # right camera is +x of left => point shifts -x
    right, _ = render_frame(world, T_rl @ Tcw, cam, **kw)
    return left, right, depth


def forward_trajectory(
    n_frames: int,
    step: float = 0.06,
    yaw_rate: float = 0.002,
    sway: float = 0.01,
) -> np.ndarray:
    """[N, 4, 4] ground-truth Tcw: mostly-forward dolly with gentle yaw/sway."""
    poses = []
    Twc = np.eye(4)
    for i in range(n_frames):
        poses.append(np.linalg.inv(Twc))
        c, s = np.cos(yaw_rate), np.sin(yaw_rate)
        dR = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        Twc = Twc @ _make_se3(dR, [sway * np.sin(i * 0.2), sway * 0.5 * np.cos(i * 0.13), step])
    return np.stack(poses)


def lateral_trajectory(
    n_frames: int,
    step: float = 0.05,
    yaw_rate: float = 0.0015,
) -> np.ndarray:
    """[N, 4, 4] Tcw: sideways dolly (good parallax for monocular init)."""
    poses = []
    Twc = np.eye(4)
    for i in range(n_frames):
        poses.append(np.linalg.inv(Twc))
        c, s = np.cos(yaw_rate), np.sin(yaw_rate)
        dR = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        Twc = Twc @ _make_se3(dR, [step, 0.005 * np.sin(i * 0.3), 0.01])
    return np.stack(poses)


def outback_trajectory(n_frames: int, step: float = 0.06, yaw_rate: float = 0.002) -> np.ndarray:
    """[N, 4, 4] Tcw: dolly out for half the frames, then retrace the same
    path back — guaranteed revisits for loop closure / relocalization."""
    half = forward_trajectory(n_frames // 2 + 1, step=step, yaw_rate=yaw_rate)
    back = half[::-1][1:]
    full = np.concatenate([half, back])[:n_frames]
    return full


def orbit_trajectory(n_frames: int, radius: float = 4.0, center_z: float = 12.0) -> np.ndarray:
    """[N, 4, 4] Tcw orbiting the world center, always looking at it —
    exercises loop closure (comes back to the start)."""
    poses = []
    for i in range(n_frames):
        a = 2.0 * np.pi * i / n_frames
        eye = np.asarray([radius * np.sin(a), 0.0, center_z - radius * np.cos(a)])
        target = np.asarray([0.0, 0.0, center_z])
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.asarray([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        dn = np.cross(fwd, right)
        Rwc = np.stack([right, dn, fwd], axis=1)
        Twc = _make_se3(Rwc, eye)
        poses.append(np.linalg.inv(Twc))
    return np.stack(poses)


def _make_se3(R, t) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


@dataclasses.dataclass
class SyntheticSequence:
    """An iterable RGB-D / stereo / mono sequence with ground truth."""

    world: SyntheticWorld
    poses: np.ndarray  # [N, 4, 4] ground-truth Tcw
    cam: CameraConfig
    # NOTE: additive sensor noise makes BRIEF pairs sampled on the flat
    # background compare randomly (descriptor Hamming ~55 between identical
    # views). Real scenes are textured everywhere; default to noiseless
    # until the renderer grows a textured backplane.
    noise: float = 0.0

    def __len__(self) -> int:
        return len(self.poses)

    def frame(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        return render_frame(self.world, self.poses[i], self.cam, noise=self.noise, seed=i)

    def stereo(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return stereo_pair(self.world, self.poses[i], self.cam, noise=self.noise, seed=i)

    def timestamps(self) -> np.ndarray:
        return np.arange(len(self.poses), dtype=np.float64) / self.cam.fps


def default_sequence(
    n_frames: int = 60,
    kind: str = "forward",
    n_points: int = 3000,
    seed: int = 0,
    cam: Optional[CameraConfig] = None,
) -> SyntheticSequence:
    cam = cam or CameraConfig(fx=480.0, fy=480.0, cx=319.5, cy=239.5, bf=48.0)
    world = make_world(n_points=n_points, seed=seed)
    if kind == "forward":
        poses = forward_trajectory(n_frames)
    elif kind == "lateral":
        poses = lateral_trajectory(n_frames)
    elif kind == "orbit":
        poses = orbit_trajectory(n_frames)
    elif kind == "outback":
        poses = outback_trajectory(n_frames)
    else:
        raise ValueError(kind)
    return SyntheticSequence(world=world, poses=poses, cam=cam)
