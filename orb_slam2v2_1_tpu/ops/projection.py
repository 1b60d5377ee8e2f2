"""Camera projection residuals + analytic Jacobians, batched.

Replaces g2o's edge types (`Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:208/367`
`EdgeSE3ProjectXYZ(OnlyPose)` and stereo variants) with vmappable JAX functions.

Pose convention: `Tcw` maps world points to camera frame; the optimization
variable is a left-multiplied tangent increment `T <- exp(xi) @ T` with
`xi = [rho, phi]` (translation, rotation) — the same update g2o's
`VertexSE3Expmap::oplusImpl` applies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie


def project(Tcw: jax.Array, pw: jax.Array, K: jax.Array) -> jax.Array:
    """Project world points (..., 3) through Tcw (..., 4, 4), K=(fx, fy, cx, cy).

    Returns pixel coords (..., 2). No distortion (keypoints are pre-undistorted,
    mirroring `Frame::UndistortKeyPoints`, reference src/Frame.cc:419-449).
    """
    pc = (Tcw[..., :3, :3] @ pw[..., None])[..., 0] + Tcw[..., :3, 3]
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = K[..., 0] * pc[..., 0] / z + K[..., 2]
    v = K[..., 1] * pc[..., 1] / z + K[..., 3]
    return jnp.stack([u, v], axis=-1)


def project_stereo(Tcw: jax.Array, pw: jax.Array, K: jax.Array, bf: jax.Array) -> jax.Array:
    """Stereo projection -> (u_left, v, u_right) with u_r = u - bf/z.

    Mirrors the 3-dof stereo edge (`EdgeStereoSE3ProjectXYZOnlyPose`).
    """
    pc = (Tcw[..., :3, :3] @ pw[..., None])[..., 0] + Tcw[..., :3, 3]
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = K[..., 0] * pc[..., 0] / z + K[..., 2]
    v = K[..., 1] * pc[..., 1] / z + K[..., 3]
    ur = u - bf / z
    return jnp.stack([u, v, ur], axis=-1)


def cam_point(Tcw: jax.Array, pw: jax.Array) -> jax.Array:
    """World point -> camera frame (..., 3)."""
    return (Tcw[..., :3, :3] @ pw[..., None])[..., 0] + Tcw[..., :3, 3]


def mono_residual_jac(Tcw, pw, uv_obs, K):
    """Residual (2,) and Jacobians wrt pose tangent (2,6) and point (2,3).

    Analytic forms matching g2o `EdgeSE3ProjectXYZ::linearizeOplus`, but in
    [rho, phi] tangent order and residual = obs - proj sign folded so that the
    Gauss-Newton step solves J dx = -r with r = proj - obs.
    """
    pc = cam_point(Tcw, pw)
    x, y = pc[0], pc[1]
    z = jnp.maximum(pc[2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    fx, fy = K[0], K[1]

    u = fx * x * iz + K[2]
    v = fy * y * iz + K[3]
    r = jnp.stack([u, v]) - uv_obs

    # d proj / d pc
    J_pc = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    )  # placeholder rows; fill with values below
    J_pc = jnp.stack(
        [
            jnp.stack([fx * iz, jnp.zeros(()), -fx * x * iz2]),
            jnp.stack([jnp.zeros(()), fy * iz, -fy * y * iz2]),
        ]
    )
    # d pc / d xi for left-mult update: d(exp(xi) pc_h) = [I, -hat(pc)]
    J_xi = jnp.concatenate([jnp.eye(3), -lie.hat(pc)], axis=-1)  # (3,6)
    J_pose = J_pc @ J_xi  # (2,6)
    J_point = J_pc @ Tcw[:3, :3]  # (2,3)
    return r, J_pose, J_point


def stereo_residual_jac(Tcw, pw, uvr_obs, K, bf):
    """Residual (3,) and Jacobians (3,6), (3,3) for the stereo edge."""
    pc = cam_point(Tcw, pw)
    x, y = pc[0], pc[1]
    z = jnp.maximum(pc[2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    fx, fy = K[0], K[1]

    u = fx * x * iz + K[2]
    v = fy * y * iz + K[3]
    ur = u - bf * iz
    r = jnp.stack([u, v, ur]) - uvr_obs

    J_pc = jnp.stack(
        [
            jnp.stack([fx * iz, jnp.zeros(()), -fx * x * iz2]),
            jnp.stack([jnp.zeros(()), fy * iz, -fy * y * iz2]),
            jnp.stack([fx * iz, jnp.zeros(()), -fx * x * iz2 + bf * iz2]),
        ]
    )
    J_xi = jnp.concatenate([jnp.eye(3), -lie.hat(pc)], axis=-1)
    return r, J_pc @ J_xi, J_pc @ Tcw[:3, :3]


def huber_weight(chi2: jax.Array, delta2: jax.Array) -> jax.Array:
    """IRLS weight for the Huber kernel given squared error and delta^2.

    Matches g2o `RobustKernelHuber::robustify` semantics: weight 1 inside,
    delta/|e| outside.
    """
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
