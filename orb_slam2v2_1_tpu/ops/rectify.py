"""Stereo rectification: undistort-rectify maps + bilinear remap on device.

Replaces the reference's online rectification path (src/ros_stereo.cc:71-116:
`cv::initUndistortRectifyMap` from per-eye K/D/R/P read out of the settings
file, then `cv::remap` per frame at src/ros_stereo.cc:158-168). Two pieces:

- `stereo_rectify`: computes the rectifying rotations + new projections from a
  raw stereo calibration (K1,D1,K2,D2,R,T) — the `cv::stereoRectify` analog,
  done once on the host (numpy, Fusiello-style: common orientation whose x-axis
  is the baseline, rotation split evenly between the eyes).
- `rectify_map`: dest-pixel -> source-pixel float map (the
  `initUndistortRectifyMap` analog), built once as a JAX array.
- `remap_bilinear`: jitted bilinear resampling applied per frame; on TPU both
  eyes are remapped in one batched call before ORB extraction, replacing the
  reference's per-eye cv::remap on two host threads (src/Frame.cc:78-81).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .undistort import distort_normalized


def _rodrigues(w: np.ndarray) -> np.ndarray:
    th = float(np.linalg.norm(w))
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _log_so3(R: np.ndarray) -> np.ndarray:
    c = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-12:
        return np.zeros(3)
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th * v / (2.0 * np.sin(th))


def stereo_rectify(K1, D1, K2, D2, R, T, size, alpha_focal: float = 1.0):
    """Compute rectifying rotations and a shared pinhole for a stereo rig.

    Convention matches the raw calibration the reference's settings files
    carry: `x_right = R @ x_left + T`. Returns dict with R1, R2 (world-aligned
    rectifying rotations applied to each eye's rays), K_new (3,3) shared
    rectified intrinsics, and bf = fx_new * baseline.
    """
    K1 = np.asarray(K1, np.float64).reshape(3, 3)
    K2 = np.asarray(K2, np.float64).reshape(3, 3)
    R = np.asarray(R, np.float64).reshape(3, 3)
    T = np.asarray(T, np.float64).reshape(3)
    W, H = size

    # Split the relative rotation evenly: rotate each eye halfway so neither
    # image warps more than necessary (cv::stereoRectify does the same).
    om = _log_so3(R)
    R_half_l = _rodrigues(-0.5 * om)  # applied to left rays
    R_half_r = R_half_l @ R.T  # net: right rays -> same frame as left-half

    # Baseline in the halfway frame; new x-axis along it.
    t = R_half_l @ (-R.T @ T)  # right camera center in left coords, rotated
    e1 = t / np.linalg.norm(t)
    if e1[0] < 0:
        e1 = -e1
    # y-axis: orthogonal to baseline, as close to old y/down as possible.
    z = np.array([0.0, 0.0, 1.0])
    e2 = np.cross(z, e1)
    e2 /= np.linalg.norm(e2)
    e3 = np.cross(e1, e2)
    R_align = np.stack([e1, e2, e3])  # rows

    R1 = R_align @ R_half_l
    R2 = R_align @ R_half_r

    # Shared rectified pinhole: average focal, principal point centered.
    f = alpha_focal * 0.25 * (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1])
    K_new = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])
    baseline = float(np.linalg.norm(T))
    return {
        "R1": R1,
        "R2": R2,
        "K_new": K_new,
        "bf": f * baseline,
        "baseline": baseline,
        "D1": np.asarray(D1, np.float64).reshape(-1),
        "D2": np.asarray(D2, np.float64).reshape(-1),
        "K1": K1,
        "K2": K2,
    }


def rectify_map(K_src, D_src, R_rect, K_new, size) -> np.ndarray:
    """(H, W, 2) map: rectified pixel -> source pixel (initUndistortRectifyMap
    semantics: iterate dest pixels, un-project through K_new, rotate rays back
    by R_rect^T, re-distort, project through K_src)."""
    K_src = np.asarray(K_src, np.float64).reshape(3, 3)
    K_new = np.asarray(K_new, np.float64).reshape(3, 3)
    R_rect = np.asarray(R_rect, np.float64).reshape(3, 3)
    D = np.zeros(5)
    D[: len(np.ravel(D_src))] = np.ravel(D_src)
    W, H = size
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    xn = (u - K_new[0, 2]) / K_new[0, 0]
    yn = (v - K_new[1, 2]) / K_new[1, 1]
    rays = np.stack([xn, yn, np.ones_like(xn)], -1) @ R_rect  # = R^T @ ray
    xs = rays[..., 0] / rays[..., 2]
    ys = rays[..., 1] / rays[..., 2]
    xyd = np.asarray(
        distort_normalized(jnp.asarray(np.stack([xs, ys], -1)), jnp.asarray(D))
    )
    mu = K_src[0, 0] * xyd[..., 0] + K_src[0, 2]
    mv = K_src[1, 1] * xyd[..., 1] + K_src[1, 2]
    return np.stack([mu, mv], -1).astype(np.float32)


@jax.jit
def remap_bilinear(img: jax.Array, map_xy: jax.Array) -> jax.Array:
    """Bilinear resample img (..., H, W) at map_xy (H', W', 2) source coords.

    Leading batch dims broadcast (both stereo eyes in one call). Out-of-range
    samples clamp to the border (cv::remap BORDER_CLAMP-alike; the reference's
    default replicates edges for the crop margins)."""
    H, W = img.shape[-2], img.shape[-1]
    x = jnp.clip(map_xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(map_xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    def gather(yy, xx):
        return img[..., yy, xx]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


class StereoRectifier:
    """Per-rig precomputed maps + one batched device remap per frame."""

    def __init__(self, K1, D1, K2, D2, R, T, size):
        self.calib = stereo_rectify(K1, D1, K2, D2, R, T, size)
        m_l = rectify_map(self.calib["K1"], self.calib["D1"], self.calib["R1"],
                          self.calib["K_new"], size)
        m_r = rectify_map(self.calib["K2"], self.calib["D2"], self.calib["R2"],
                          self.calib["K_new"], size)
        self.maps = jnp.asarray(np.stack([m_l, m_r]))  # (2, H, W, 2)
        k = self.calib["K_new"]
        self.K = (float(k[0, 0]), float(k[1, 1]), float(k[0, 2]), float(k[1, 2]))
        self.bf = float(self.calib["bf"])

    def __call__(self, img_left, img_right):
        imgs = jnp.stack([jnp.asarray(img_left, jnp.float32),
                          jnp.asarray(img_right, jnp.float32)])
        out = jax.vmap(remap_bilinear)(imgs, self.maps)
        return out[0], out[1]
