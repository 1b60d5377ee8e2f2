"""Dense point-cloud and occupancy-grid export.

Replaces `PointCloudMapping` (reference src/pointcloudmapping.cc: PCL
back-projection of every 3rd RGB-D pixel, 0.1 m voxel filter, OctoMap `.bt`
export at 0.1 m resolution): pure array back-projection + voxel hashing, PLY
and npz-occupancy writers — no PCL/OctoMap dependency.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from functools import partial

from ..ops import lie


@partial(jax.jit, static_argnames=("stride",))
def backproject(depth: jax.Array, Tcw: jax.Array, K: jax.Array, stride: int = 3):
    """Depth (H, W) -> world points (H//s * W//s, 3), invalid rows = NaN.

    Mirrors the every-3rd-pixel sampling (src/pointcloudmapping.cc:92-104).
    """
    d = depth[::stride, ::stride]
    H, W = d.shape
    ys = jnp.arange(H) * stride
    xs = jnp.arange(W) * stride
    u, v = jnp.meshgrid(xs.astype(jnp.float32), ys.astype(jnp.float32))
    z = d
    x = (u - K[2]) * z / K[0]
    y = (v - K[3]) * z / K[1]
    pc = jnp.stack([x, y, z], -1).reshape(-1, 3)
    Twc = lie.se3_inverse(Tcw)
    pw = pc @ Twc[:3, :3].T + Twc[:3, 3]
    return jnp.where((z.reshape(-1, 1) > 0), pw, jnp.nan)


def voxel_downsample(points: np.ndarray, voxel: float = 0.1) -> np.ndarray:
    """Keep one point per voxel (the 0.1 m VoxelGrid filter analog)."""
    pts = points[np.isfinite(points).all(axis=1)]
    if len(pts) == 0:
        return pts
    keys = np.floor(pts / voxel).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return pts[np.sort(idx)]


def save_ply(points: np.ndarray, path: str | Path, colors: np.ndarray | None = None):
    pts = points[np.isfinite(points).all(axis=1)]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i, p in enumerate(pts):
            line = f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}"
            if colors is not None:
                c = colors[i].astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")


def occupancy_grid(points: np.ndarray, voxel: float = 0.1):
    """Occupied-voxel set (the OctoMap `.bt` analog): returns (origin (3,),
    voxel size, (N,3) int voxel coords)."""
    pts = points[np.isfinite(points).all(axis=1)]
    if len(pts) == 0:
        return np.zeros(3), voxel, np.zeros((0, 3), np.int32)
    origin = pts.min(0)
    keys = np.floor((pts - origin) / voxel).astype(np.int32)
    occ = np.unique(keys, axis=0)
    return origin, voxel, occ


def save_occupancy(points: np.ndarray, path: str | Path, voxel: float = 0.1):
    origin, res, occ = occupancy_grid(points, voxel)
    np.savez_compressed(path, origin=origin, voxel=res, occupied=occ)


def export_sparse_map_ply(state, path: str | Path):
    """Sparse map-point cloud (the MapDrawer::DrawMapPoints data)."""
    pts = np.asarray(state.mp_pos)[np.asarray(state.mp_valid)]
    save_ply(pts, path)


class DenseMapper:
    """Accumulating dense mapper (PointCloudMapping analog): feed keyframe
    depth images, export merged cloud / occupancy at shutdown
    (src/pointcloudmapping.cc:68-127, 117-281)."""

    def __init__(self, K, voxel: float = 0.1, stride: int = 3):
        self.K = jnp.asarray(K)
        self.voxel = voxel
        self.stride = stride
        self.clouds: list[np.ndarray] = []

    def insert_keyframe(self, depth, Tcw):
        pw = backproject(jnp.asarray(depth, jnp.float32), jnp.asarray(Tcw), self.K,
                         self.stride)
        self.clouds.append(voxel_downsample(np.asarray(pw), self.voxel))

    def global_cloud(self) -> np.ndarray:
        if not self.clouds:
            return np.zeros((0, 3), np.float32)
        return voxel_downsample(np.concatenate(self.clouds), self.voxel)

    def save(self, ply_path=None, occupancy_path=None):
        cloud = self.global_cloud()
        if ply_path:
            save_ply(cloud, ply_path)
        if occupancy_path:
            save_occupancy(cloud, occupancy_path, self.voxel)
        return cloud
