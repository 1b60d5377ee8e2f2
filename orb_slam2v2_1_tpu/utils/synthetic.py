"""Synthetic textured-plane renderer + ground-truth trajectories.

The reference has no tests (SURVEY §4); this renderer is our integration
harness: camera flies through a room of textured planes, the full pipeline
(images in -> trajectory out) runs, and ATE vs the analytic ground truth is
asserted. Rendering = per-pixel ray/plane intersection + bilinear texture
lookup, all in jitted JAX.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie


class PlaneScene(NamedTuple):
    origin: jax.Array  # (P,3) plane corner
    ux: jax.Array  # (P,3) texture u axis (length = width in meters)
    vy: jax.Array  # (P,3) texture v axis
    tex: jax.Array  # (P,T,T) f32 textures


def blob_texture(rng: np.random.Generator, size: int = 512, n_blobs: int = 900) -> np.ndarray:
    """Multi-scale filtered noise: locally unique, corner-rich texture.

    Axis-aligned rectangle blobs were measured to ALIAS badly — every blob
    corner has a near-identical descriptor, so a drifted pose always finds a
    plausible (wrong) match within its search window and the pose optimizer
    happily confirms the drift. Band-limited noise makes every patch unique,
    like real-world texture.
    """
    del n_blobs
    from scipy.ndimage import gaussian_filter

    img = np.zeros((size, size), np.float32)
    for sigma, amp in ((1.5, 1.0), (3.0, 1.2), (6.0, 1.5), (12.0, 1.5)):
        img += amp * gaussian_filter(rng.standard_normal((size, size)), sigma).astype(
            np.float32
        )
    img -= img.min()
    img *= 235.0 / max(img.max(), 1e-6)
    return img + 10.0


def make_room(rng: np.random.Generator, tex_size: int = 512) -> PlaneScene:
    """A 8x6x4 m room with cluttered close-range structure.

    An empty room whose view is dominated by a distant fronto-parallel wall
    is DEGENERATE for visual odometry (yaw and lateral translation become
    near-indistinguishable; measured as twin minima in the pose cost). The
    target benchmark (TUM fr1 desk) is a cluttered close-range scene, so the
    harness includes mid-room boxes at 2-5 m giving strong depth variation.
    """
    planes = [
        # origin, ux, vy
        ([-4.0, 2.0, 0.0], [8.0, 0.0, 0.0], [0.0, 0.0, 8.0]),  # floor y=+2
        ([-4.0, -2.0, 0.0], [8.0, 0.0, 0.0], [0.0, 0.0, 8.0]),  # ceiling y=-2
        ([-4.0, -2.0, 8.0], [8.0, 0.0, 0.0], [0.0, 4.0, 0.0]),  # back wall z=8
        ([-4.0, -2.0, 0.0], [0.0, 0.0, 8.0], [0.0, 4.0, 0.0]),  # left wall x=-4
        ([4.0, -2.0, 0.0], [0.0, 0.0, 8.0], [0.0, 4.0, 0.0]),  # right wall x=+4
        ([-4.0, -2.0, 0.0], [8.0, 0.0, 0.0], [0.0, 4.0, 0.0]),  # front wall z=0
    ]
    # Mid-room boxes: front faces + one side face each.
    boxes = [
        # (corner x, y_top, z_front, w, h)
        (-2.5, 0.2, 3.0, 1.2, 1.4),
        (0.6, -0.5, 4.2, 1.5, 1.8),
        (-0.8, 0.6, 2.2, 0.9, 1.0),
        (2.0, -0.2, 5.0, 1.4, 1.6),
        (-3.0, -1.0, 5.5, 1.6, 1.6),
    ]
    for (bx, by, bz, w, h) in boxes:
        planes.append(([bx, by, bz], [w, 0.0, 0.0], [0.0, h, 0.0]))  # front face
        planes.append(([bx + w, by, bz], [0.0, 0.0, 1.0], [0.0, h, 0.0]))  # side
    tex = np.stack([blob_texture(rng, tex_size) for _ in planes])
    o, u, v = (np.asarray([p[i] for p in planes], np.float32) for i in range(3))
    return PlaneScene(jnp.asarray(o), jnp.asarray(u), jnp.asarray(v), jnp.asarray(tex))


def render(scene: PlaneScene, Tcw: jax.Array, K: jax.Array, width: int, height: int):
    return _render(scene, Tcw, K, width, height)


from functools import partial


@partial(jax.jit, static_argnames=("width", "height"))
def _render(scene: PlaneScene, Tcw: jax.Array, K: jax.Array, width: int, height: int):
    Twc = lie.se3_inverse(Tcw)
    cam_o = Twc[:3, 3]
    R = Twc[:3, :3]

    ys, xs = jnp.mgrid[0:height, 0:width]
    dirs_cam = jnp.stack(
        [(xs - K[2]) / K[0], (ys - K[3]) / K[1], jnp.ones_like(xs, jnp.float32)], -1
    )
    dirs = dirs_cam @ R.T  # (H,W,3) world

    T = scene.tex.shape[-1]

    def plane_hit(o, ux, vy, tex):
        n = jnp.cross(ux, vy)
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-9)
        denom = dirs @ n
        tt = ((o - cam_o) @ n) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        hit = cam_o + tt[..., None] * dirs
        rel = hit - o
        uu = (rel @ ux) / jnp.maximum(ux @ ux, 1e-9)
        vv = (rel @ vy) / jnp.maximum(vy @ vy, 1e-9)
        ok = (tt > 0.05) & (uu >= 0) & (uu < 1) & (vv >= 0) & (vv < 1)
        # Bilinear sample.
        fu = jnp.clip(uu * (T - 1), 0, T - 1)
        fv = jnp.clip(vv * (T - 1), 0, T - 1)
        u0 = jnp.floor(fu).astype(jnp.int32)
        v0 = jnp.floor(fv).astype(jnp.int32)
        u1 = jnp.minimum(u0 + 1, T - 1)
        v1 = jnp.minimum(v0 + 1, T - 1)
        au = fu - u0
        av = fv - v0
        val = (
            tex[v0, u0] * (1 - au) * (1 - av)
            + tex[v0, u1] * au * (1 - av)
            + tex[v1, u0] * (1 - au) * av
            + tex[v1, u1] * au * av
        )
        return jnp.where(ok, tt, jnp.inf), jnp.where(ok, val, 0.0)

    ts, vals = jax.vmap(plane_hit)(scene.origin, scene.ux, scene.vy, scene.tex)
    best = jnp.argmin(ts, axis=0)
    img = jnp.take_along_axis(vals, best[None], axis=0)[0]
    depth = jnp.take_along_axis(ts, best[None], axis=0)[0]
    depth = jnp.where(jnp.isinf(depth), 0.0, depth)
    return img, depth


def make_desk(rng: np.random.Generator, tex_size: int = 512) -> PlaneScene:
    """Desk-like close-range scene (the TUM fr1 benchmark character): a wall
    at 3.5 m, a horizontal desk plane, and a clutter of boxes at 1.3-2.8 m
    that fill most of the view from the origin."""
    planes = [
        ([-3.0, -2.0, 3.5], [6.0, 0.0, 0.0], [0.0, 4.0, 0.0]),  # back wall
        ([-3.0, 1.0, 0.5], [6.0, 0.0, 0.0], [0.0, 0.5, 3.0]),  # desk (tilted top)
    ]
    boxes = [
        (-1.8, -1.0, 1.6, 0.8, 1.0),
        (-0.6, -0.3, 1.4, 0.7, 0.9),
        (0.5, -1.2, 1.9, 0.9, 1.1),
        (1.4, 0.0, 1.5, 0.8, 0.8),
        (-2.4, 0.2, 2.3, 1.0, 0.8),
        (0.0, 0.5, 2.1, 1.2, 0.6),
        (-1.0, -1.8, 2.6, 1.3, 1.0),
        (1.8, -0.9, 2.8, 1.1, 1.2),
    ]
    for (bx, by, bz, w, h) in boxes:
        planes.append(([bx, by, bz], [w, 0.0, 0.0], [0.0, h, 0.0]))
        planes.append(([bx + w, by, bz], [0.0, 0.0, 0.6], [0.0, h, 0.0]))
    tex = np.stack([blob_texture(rng, tex_size) for _ in planes])
    o, u, v = (np.asarray([p[i] for p in planes], np.float32) for i in range(3))
    return PlaneScene(jnp.asarray(o), jnp.asarray(u), jnp.asarray(v), jnp.asarray(tex))


def desk_trajectory(n_frames: int, extent: float = 0.7) -> list[np.ndarray]:
    """fr1/xyz-like sweep: lateral/vertical translation with gentle yaw that
    keeps the desk centered. Returns Tcw list (world = first camera)."""
    poses = []
    look_z = 2.2  # fixation depth
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        x = extent * np.sin(2 * np.pi * s)
        y = 0.25 * np.sin(4 * np.pi * s)
        z = 0.15 * np.sin(2 * np.pi * s + 1.0)
        yaw = -np.arctan2(x, look_z)  # keep looking at scene center
        xi = np.array([x, y, z, 0.0, yaw, 0.0], np.float32)
        Twc = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        poses.append(np.linalg.inv(Twc).astype(np.float32))
    return poses


def lateral_trajectory(n_frames: int, extent: float = 1.5) -> list[np.ndarray]:
    """Smooth lateral sweep with slight yaw — good parallax for mono init.
    Returns a list of Tcw (world = first camera)."""
    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        x = extent * np.sin(2 * np.pi * s * 0.5)
        yaw = 0.1 * np.sin(2 * np.pi * s)
        xi = np.array([x, 0.1 * np.sin(4 * np.pi * s), 0.3 * s, 0.0, yaw, 0.0], np.float32)
        Twc = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        poses.append(np.linalg.inv(Twc).astype(np.float32))
    return poses
