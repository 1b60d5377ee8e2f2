"""Dataset loaders: TUM RGB-D, KITTI odometry, and the synthetic harness.

Replaces the reference's ROS-topic ingestion (src/ros_rgbd.cc subscribers +
ApproximateTime sync): file-based loaders with the standard timestamp
association logic for TUM (max 0.02 s offset, as the TUM tools use).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _read_tum_list(path: Path):
    out = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        out.append((float(parts[0]), parts[1]))
    return out


def load_tum_rgbd(root: str | Path, max_dt: float = 0.02):
    """TUM fr1-style directory (rgb.txt, depth.txt, groundtruth.txt).

    Yields dicts {t, rgb_path, depth_path}; ground truth returned separately
    as {t: Twc (4,4)}.
    """
    root = Path(root)
    rgb = _read_tum_list(root / "rgb.txt")
    depth = _read_tum_list(root / "depth.txt")
    d_times = np.array([t for t, _ in depth])

    pairs = []
    for t, rgb_path in rgb:
        j = int(np.argmin(np.abs(d_times - t)))
        if abs(d_times[j] - t) <= max_dt:
            pairs.append(
                {"t": t, "rgb": root / rgb_path, "depth": root / depth[j][1]}
            )

    gt = {}
    gt_file = root / "groundtruth.txt"
    if gt_file.exists():
        from ..ops import lie
        import jax.numpy as jnp

        for line in gt_file.read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            t, tx, ty, tz, qx, qy, qz, qw = v[:8]
            R = np.asarray(lie.quat_to_rot(jnp.asarray([qx, qy, qz, qw], jnp.float32)))
            Twc = np.eye(4)
            Twc[:3, :3] = R
            Twc[:3, 3] = [tx, ty, tz]
            gt[t] = Twc
    return pairs, gt


def read_image_gray(path) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path))
    if img.ndim == 3:
        img = img @ np.array([0.299, 0.587, 0.114])
    return img.astype(np.float32)


def read_depth_tum(path, factor: float = 5000.0) -> np.ndarray:
    from PIL import Image

    d = np.asarray(Image.open(path)).astype(np.float32)
    return d / factor


def load_kitti_stereo(root: str | Path, sequence: str = "00"):
    """KITTI odometry grayscale pair lists + times + ground truth poses."""
    root = Path(root)
    seq = root / "sequences" / sequence
    lefts = sorted((seq / "image_0").glob("*.png"))
    rights = sorted((seq / "image_1").glob("*.png"))
    times = [float(x) for x in (seq / "times.txt").read_text().split()]
    gt = {}
    pose_file = root / "poses" / f"{sequence}.txt"
    if pose_file.exists():
        for i, line in enumerate(pose_file.read_text().splitlines()):
            vals = np.fromstring(line, sep=" ").reshape(3, 4)
            Twc = np.eye(4)
            Twc[:3] = vals
            gt[times[i]] = Twc
    pairs = [
        {"t": t, "left": l, "right": r} for t, l, r in zip(times, lefts, rights)
    ]
    return pairs, gt
