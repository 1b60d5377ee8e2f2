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


# EuRoC cam0 body->sensor extrinsic (x_body = T_BS @ x_cam0), the value every
# EuRoC MAV dataset ships in mav0/cam0/sensor.yaml. Used to convert the
# groundtruth T_WB (body/IMU in world) into true camera poses; without it ATE
# against SLAM camera poses picks up attitude-dependent error of several cm.
EUROC_CAM0_T_BS = np.array(
    [
        [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
        [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
        [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def _read_euroc_t_bs(sensor_yaml: Path) -> np.ndarray | None:
    """Parse the T_BS 4x4 from a EuRoC sensor.yaml without a YAML dependency
    (the file is machine-generated: `data: [a, b, ...]` on the lines after
    `T_BS:`)."""
    try:
        text = sensor_yaml.read_text()
    except OSError:
        return None
    import re

    m = re.search(r"T_BS:.*?data:\s*\[([^\]]+)\]", text, re.DOTALL)
    if not m:
        return None
    vals = [float(x) for x in m.group(1).replace("\n", " ").split(",")]
    if len(vals) != 16:
        return None
    return np.array(vals).reshape(4, 4)


def load_euroc_stereo(root: str | Path, max_dt: float = 0.005):
    """EuRoC ASL directory (mav0/cam0, mav0/cam1, state_groundtruth_estimate0).

    Mirrors the reference's EuRoC stereo usage (src/ros_stereo.cc subscribes
    to the two image topics and rectifies online; here we pair cam0/cam1 by
    nanosecond timestamp). Returns (pairs, gt) like the other loaders; gt maps
    time (s) -> Twc (4,4) — the groundtruth csv stores T_WB (body/IMU in
    world), which is composed with cam0's T_BS extrinsic (read from
    mav0/cam0/sensor.yaml, falling back to the factory value) to yield camera
    poses comparable against SLAM output.
    """
    root = Path(root)

    def read_cam(cam):
        rows = []
        csv = root / "mav0" / cam / "data.csv"
        for line in csv.read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts_ns, fname = line.split(",")[:2]
            rows.append((int(ts_ns) * 1e-9, root / "mav0" / cam / "data" / fname.strip()))
        return rows

    cam0 = read_cam("cam0")
    cam1 = read_cam("cam1")
    t1 = np.array([t for t, _ in cam1])
    pairs = []
    for t, left in cam0:
        j = int(np.argmin(np.abs(t1 - t)))
        if abs(t1[j] - t) <= max_dt:
            pairs.append({"t": t, "left": left, "right": cam1[j][1]})

    gt = {}
    gt_csv = root / "mav0" / "state_groundtruth_estimate0" / "data.csv"
    if gt_csv.exists():
        from ..ops import lie
        import jax.numpy as jnp

        T_BS = _read_euroc_t_bs(root / "mav0" / "cam0" / "sensor.yaml")
        if T_BS is None:
            T_BS = EUROC_CAM0_T_BS
        for line in gt_csv.read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = line.split(",")
            t = int(v[0]) * 1e-9
            tx, ty, tz = float(v[1]), float(v[2]), float(v[3])
            qw, qx, qy, qz = float(v[4]), float(v[5]), float(v[6]), float(v[7])
            R = np.asarray(lie.quat_to_rot(jnp.asarray([qx, qy, qz, qw], jnp.float32)))
            T_WB = np.eye(4)
            T_WB[:3, :3] = R
            T_WB[:3, 3] = [tx, ty, tz]
            gt[t] = T_WB @ T_BS  # Twc: camera (cam0) pose in world
    return pairs, gt


# EuRoC factory stereo calibration (the values the reference's EuRoC settings
# file carries for LEFT/RIGHT K/D plus the cam0->cam1 extrinsics from the MAV
# sensor.yaml files), used to build a StereoRectifier when running raw ASL data.
EUROC_CALIB = {
    "K1": [[458.654, 0.0, 367.215], [0.0, 457.296, 248.375], [0.0, 0.0, 1.0]],
    "D1": [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0],
    "K2": [[457.587, 0.0, 379.999], [0.0, 456.134, 255.238], [0.0, 0.0, 1.0]],
    "D2": [-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05, 0.0],
    # x_cam1 = R @ x_cam0 + T
    "R": [
        [0.999997256, 0.002312067, 0.000376008],
        [-0.002317135, 0.999898049, 0.014089836],
        [-0.000343393, -0.014090668, 0.999900663],
    ],
    "T": [-0.110073808, 0.000399121, -0.000853703],
    "size": (752, 480),
}


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
