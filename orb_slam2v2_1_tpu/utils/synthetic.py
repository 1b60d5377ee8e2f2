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


def make_adversarial(rng: np.random.Generator, tex_size: int = 512,
                     n_clutter: int = 28, low_texture_frac: float = 0.35,
                     max_tilt_deg: float | None = None) -> PlaneScene:
    """Adversarial close-range scene: non-axis-aligned clutter with heavy
    self-occlusion, plus a fraction of LOW-TEXTURE surfaces.

    Unlike make_desk/make_room (axis-aligned fronto-parallel faces), the
    clutter planes here have random orientations (slanted normals — worst
    case for the fronto-parallel BRIEF patch model), random sizes, and
    overlap in depth so the z-buffer produces real occlusion boundaries
    (depth edges with background leakage — what the 3x3 depth-edge filter
    exists for). `low_texture_frac` of all surfaces get near-uniform
    textures (contrast scaled to ~6 gray levels), creating featureless
    holes in the view like white walls / table tops.

    `max_tilt_deg` bounds the clutter normals' angle from the camera axis
    (None = unconstrained random orientation). Monocular two-view
    bootstrapping legitimately requires mostly camera-facing texture —
    appearance on heavily slanted planes decorrelates within a frame or
    two of baseline, and the reference's mono init fails the same way —
    so the mono evaluation twin uses ~35 deg while depth sensors take the
    unconstrained scene."""
    planes = [
        ([-3.0, -2.0, 4.0], [6.0, 0.0, 0.0], [0.0, 4.0, 0.0]),  # back wall
        ([-3.0, 1.2, 0.5], [6.0, 0.0, 0.0], [0.0, 0.3, 3.5]),  # floor/desk
    ]
    for _ in range(n_clutter):
        # Random center in the 1.2-3.5 m working volume.
        c = np.array([
            rng.uniform(-2.2, 2.2), rng.uniform(-1.4, 1.0),
            rng.uniform(1.2, 3.5),
        ])
        # Random in-plane axes: random rotation, random extents.
        if max_tilt_deg is None:
            q = rng.standard_normal((3, 3))
            qq, _ = np.linalg.qr(q)
        else:
            tilt = np.deg2rad(rng.uniform(0.0, max_tilt_deg))
            azim = rng.uniform(0, 2 * np.pi)
            n = np.array([
                np.sin(tilt) * np.cos(azim), np.sin(tilt) * np.sin(azim),
                -np.cos(tilt),
            ])
            roll = rng.uniform(0, 2 * np.pi)
            a = np.cross(n, [0.0, 1.0, 0.0])
            a /= max(np.linalg.norm(a), 1e-9)
            b = np.cross(n, a)
            qq = np.stack(
                [np.cos(roll) * a + np.sin(roll) * b,
                 -np.sin(roll) * a + np.cos(roll) * b, n], axis=1,
            )
        w, h = rng.uniform(0.3, 0.9, 2)
        ux = qq[:, 0] * w
        vy = qq[:, 1] * h
        planes.append((c - ux / 2 - vy / 2, ux, vy))
    tex = []
    for i in range(len(planes)):
        t = blob_texture(rng, tex_size)
        if rng.uniform() < low_texture_frac:
            t = 120.0 + (t - t.mean()) * 0.025  # ~6 gray levels of contrast
        tex.append(t)
    o, u, v = (np.asarray([np.asarray(p[i], np.float32) for p in planes])
               for i in range(3))
    return PlaneScene(
        jnp.asarray(o), jnp.asarray(u), jnp.asarray(v),
        jnp.asarray(np.stack(tex).astype(np.float32)),
    )


@partial(jax.jit, static_argnames=("length",))
def _motion_blur(img: jax.Array, direction: jax.Array, length: int):
    """Directional box blur: average `length` taps along `direction` (px)."""
    taps = jnp.arange(length, dtype=jnp.float32) - (length - 1) / 2.0
    offs = taps[:, None] * direction[None, :]  # (L, 2) dy,dx

    def tap(off):
        return jnp.roll(img, (jnp.round(off[0]).astype(jnp.int32),
                              jnp.round(off[1]).astype(jnp.int32)), (0, 1))

    return jnp.mean(jax.vmap(tap)(offs), axis=0)


def degrade_frame(img, rng: np.random.Generator, gain: float = 1.0,
                  blur_dir=None, blur_len: int = 0, noise_sigma: float = 0.0):
    """Photometric degradation pipeline (applied AFTER rendering, like a
    camera): exposure gain, directional motion blur, sensor noise, 8-bit
    quantization with saturation."""
    out = jnp.asarray(img)
    if blur_len >= 2 and blur_dir is not None:
        out = _motion_blur(out, jnp.asarray(blur_dir, jnp.float32), int(blur_len))
    out = out * gain
    if noise_sigma > 0:
        out = out + jnp.asarray(
            rng.standard_normal(np.asarray(img).shape) * noise_sigma, jnp.float32
        )
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def exposure_schedule(n_frames: int, rng: np.random.Generator,
                      n_steps: int = 4, lo: float = 0.55, hi: float = 1.7):
    """Piecewise-constant gain with abrupt steps (auto-exposure jumps)."""
    gains = np.ones(n_frames, np.float32)
    cuts = sorted(rng.choice(np.arange(5, n_frames - 1), n_steps, replace=False))
    g = 1.0
    prev = 0
    for c in cuts:
        gains[prev:c] = g
        g = float(rng.uniform(lo, hi))
        prev = c
    gains[prev:] = g
    return gains


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
