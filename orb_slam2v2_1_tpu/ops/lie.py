"""SE(3) / Sim(3) manifold operations, batched and jit-friendly.

TPU-native replacement for the reference's vendored g2o types
(`Thirdparty/g2o/g2o/types/se3quat.h:306`, `sim3.h:307`,
`types_six_dof_expmap.h`, `types_seven_dof_expmap.h:48-152`) and the
cv::Mat/Eigen `Converter` shims (`src/Converter.cc`).

Conventions
-----------
* Poses are world->camera transforms `Tcw`, matching the reference.
* SE3 is stored as a 4x4 homogeneous matrix (row-major); tangent vectors are
  `[rho(3), phi(3)]` (translation first, rotation second — g2o SE3Quat order).
* Sim3 tangent is `[rho(3), phi(3), sigma(1)]` with scale `s = exp(sigma)`;
  the group element is stored as a 4x4 matrix whose upper-left 3x3 is `s*R`.
* Everything broadcasts over arbitrary leading batch dimensions and is safe
  under `jax.jit` / `jax.vmap` / autodiff (Taylor-guarded near theta=0).

f32 is the default dtype; the LM cores keep normal-equation accumulation in
f32 with careful scaling (the reference uses f64 via Eigen — see SURVEY §7
"hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul at HIGHEST precision.

    TPU MXU default-precision f32 matmul loses ~1e-2 relative accuracy on
    exp/log round trips (measured on v5e) — unacceptable for pose math that
    feeds LM convergence checks. These are tiny 3x3/3x1 products, so forcing
    full f32 costs nothing.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def hat(phi: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of `hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _safe_norm(x: jax.Array) -> jax.Array:
    """L2 norm over the last axis with a NaN-free gradient at ||x|| = 0.

    `jnp.linalg.norm` has d||x||/dx = x/||x|| which is NaN at zero and
    poisons autodiff through the Taylor-guarded branches; here the zero
    branch is a constant so its gradient is exactly zero.
    """
    sq = jnp.sum(x * x, axis=-1)
    small = sq < 1e-16
    safe = jnp.where(small, 1.0, sq)
    return jnp.where(small, 0.0, jnp.sqrt(safe))


def _sinc(x: jax.Array) -> jax.Array:
    """sin(x)/x, Taylor-guarded at 0."""
    small = jnp.abs(x) < 1e-4
    safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(safe) / safe)


def _cosc(x: jax.Array) -> jax.Array:
    """(1-cos(x))/x^2, Taylor-guarded at 0."""
    small = jnp.abs(x) < 1e-4
    safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 0.5 - x * x / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    theta = _safe_norm(phi)[..., None, None]  # (...,1,1)
    W = hat(phi)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + _sinc(theta) * W + _cosc(theta) * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle, (..., 3, 3) -> (..., 3).

    Handles theta near 0 and near pi (where the antisymmetric part vanishes).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    # atan2(|w|, cos) instead of arccos(cos): arccos' blows up at the
    # identity, poisoning autodiff of zero residuals (pose-graph edges).
    theta = jnp.arctan2(_safe_norm(w), cos_t)[..., None]  # (...,1)

    # Generic branch: phi = theta/sin(theta) * w.
    generic = w / jnp.maximum(_sinc(theta), _EPS)

    # Near pi: axis from diagonal of (R + I)/2 = outer(a, a)(1 - eps terms).
    # B = (R + I); diag(B)/ (1 + cos) -> axis^2 * const; take sqrt with signs
    # from the largest column of B.
    B = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(B, k[..., None, None], axis=-1)[..., 0]  # (...,3)
    axis = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), _EPS)
    # Fix sign so axis agrees with w (w = sin(theta)*axis, tiny near pi but signed).
    sign = jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    near_pi = theta * sign * axis

    use_pi = theta[..., 0] > (jnp.pi - 1e-3)
    return jnp.where(use_pi[..., None], near_pi, generic)


def _left_jacobian(phi: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(phi): (..., 3) -> (..., 3, 3)."""
    theta = _safe_norm(phi)[..., None, None]
    W = hat(phi)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    # J = I + (1-cos)/t^2 W + (t - sin t)/t^3 W^2
    small = jnp.abs(theta) < 1e-4
    safe = jnp.where(small, 1.0, theta)
    c3 = jnp.where(small, 1.0 / 6.0 - theta * theta / 120.0, (safe - jnp.sin(safe)) / (safe**3))
    return eye + _cosc(theta) * W + c3 * W2


def _left_jacobian_inv(phi: jax.Array) -> jax.Array:
    """Inverse SO(3) left Jacobian."""
    theta = _safe_norm(phi)[..., None, None]
    W = hat(phi)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    small = jnp.abs(theta) < 1e-4
    safe = jnp.where(small, 1.0, theta)
    half = safe * 0.5
    cot = jnp.where(small, 1.0 / 12.0 + theta * theta / 720.0,
                    (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / (safe * safe))
    return eye - 0.5 * W + cot * W2


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) tangent [rho, phi] (..., 6) -> (..., 4, 4) homogeneous matrix."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    R = so3_exp(phi)
    t = (_mm(_left_jacobian(phi), rho[..., None]))[..., 0]
    return make_se3(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6) tangent [rho, phi]."""
    phi = so3_log(T[..., :3, :3])
    rho = (_mm(_left_jacobian_inv(phi), T[..., :3, 3:4]))[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def project_so3(R: jax.Array) -> jax.Array:
    """Project a near-rotation onto SO(3) (quaternion round trip).

    f32 pose products lose ~1e-7 orthonormality per composition; through the
    tracking velocity feedback (pose -> velocity -> prediction -> pose) the
    deviation COMPOUNDS geometrically (measured x2.3/frame) until the
    rotation block carries a real scale error. Re-projecting at trust
    boundaries (velocity update, optimizer entry) keeps poses rigid.
    """
    return quat_to_rot(rot_to_quat(R))


def orthonormalize(T: jax.Array) -> jax.Array:
    """Re-orthonormalize the rotation block of an SE3 matrix (..., 4, 4)."""
    return make_se3(project_so3(T[..., :3, :3]), T[..., :3, 3])


def make_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (..., 4, 4) from rotation (..., 3, 3) and translation (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(jnp.broadcast_to(R, batch + (3, 3)))
    T = T.at[..., :3, 3].set(jnp.broadcast_to(t, batch + (3,)))
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inverse(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -(_mm(Rt, t[..., None]))[..., 0])


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return _mm(pts, jnp.swapaxes(R, -1, -2)) + t[..., None, :]


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------

def make_sim3(R: jax.Array, t: jax.Array, s: jax.Array) -> jax.Array:
    """Assemble Sim3 as 4x4 with upper-left `s*R` (s broadcastable scalar (...,))."""
    return make_se3(R * s[..., None, None], t)


def sim3_parts(S: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decompose (..., 4, 4) Sim3 -> (R, t, s)."""
    sR = S[..., :3, :3]
    s = jnp.linalg.norm(sR[..., 0, :], axis=-1)
    R = sR / s[..., None, None]
    return R, S[..., :3, 3], s


def sim3_inverse(S: jax.Array) -> jax.Array:
    R, t, s = sim3_parts(S)
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return make_sim3(Rt, -s_inv[..., None] * (_mm(Rt, t[..., None]))[..., 0], s_inv)


def sim3_exp(xi: jax.Array) -> jax.Array:
    """sim(3) tangent [rho(3), phi(3), sigma(1)] -> (..., 4, 4).

    Uses the closed-form W matrix from Strasdat's thesis (the same
    parameterization g2o's `sim3.h` implements).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    theta = _safe_norm(phi)
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    W = _sim3_W(theta, sigma, hat(phi))
    t = (_mm(W, rho[..., None]))[..., 0]
    return make_sim3(R, t, s)


def sim3_log(S: jax.Array) -> jax.Array:
    R, t, s = sim3_parts(S)
    sigma = jnp.log(s)
    phi = so3_log(R)
    theta = _safe_norm(phi)
    W = _sim3_W(theta, sigma, hat(phi))
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def _sim3_W(theta: jax.Array, sigma: jax.Array, Phi: jax.Array) -> jax.Array:
    """The W matrix in Sim3 exp: t = W rho.

    W = A * Phi + B * Phi^2 + C * I, with scale/angle-dependent coefficients
    (Taylor-guarded for small sigma and/or theta).
    """
    dtype = Phi.dtype
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Phi.shape)
    Phi2 = _mm(Phi, Phi)
    s = jnp.exp(sigma)

    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5
    safe_sig = jnp.where(small_sig, 1.0, sigma)
    safe_th = jnp.where(small_th, 1.0, theta)

    C = jnp.where(small_sig, 1.0 + sigma / 2.0, (s - 1.0) / safe_sig)

    sig2 = safe_sig * safe_sig
    th2 = safe_th * safe_th
    denom = sig2 + th2

    # Branch on small sigma:
    #   A0 = (1-cos th)/th^2, B0 = (th - sin th)/th^3   (sigma -> 0)
    # and small theta:
    #   A1 = ((sigma-1)e^s + 1)/sigma^2 ... standard limits
    sin_th, cos_th = jnp.sin(safe_th), jnp.cos(safe_th)

    a_sig = s * sin_th
    b_sig = s * cos_th
    A_gen = (a_sig * safe_sig + (1.0 - b_sig) * safe_th) / (safe_th * denom)
    B_gen = (C - ((b_sig - 1.0) * safe_sig + a_sig * safe_th) / denom) / th2

    A_sig0 = _cosc(safe_th)  # (1-cos)/th^2
    B_sig0 = (safe_th - sin_th) / (safe_th**3)

    A_th0 = jnp.where(small_sig, 0.5 + sigma / 3.0, ((safe_sig - 1.0) * s + 1.0) / sig2)
    B_th0 = jnp.where(
        small_sig,
        1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * sig2 - safe_sig + 1.0) - 1.0) / (sig2 * safe_sig),
    )

    A = jnp.where(small_th, A_th0, jnp.where(small_sig, A_sig0, A_gen))
    B = jnp.where(small_th, B_th0, jnp.where(small_sig, B_sig0, B_gen))

    return (
        C[..., None, None] * eye
        + A[..., None, None] * Phi
        + B[..., None, None] * Phi2
    )


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w) — TUM trajectory export convention
# ---------------------------------------------------------------------------

def rot_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> quaternion (..., 4) as (x, y, z, w), w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick numerically stable one by max pivot.
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5

    cand_w = jnp.stack([_sgn(m21 - m12) * qx, _sgn(m02 - m20) * qy, _sgn(m10 - m01) * qz, qw], axis=-1)
    cand_x = jnp.stack([qx, _sgn(m01 + m10) * qy, _sgn(m02 + m20) * qz, _sgn(m21 - m12) * qw], axis=-1)
    cand_y = jnp.stack([_sgn(m01 + m10) * qx, qy, _sgn(m12 + m21) * qz, _sgn(m02 - m20) * qw], axis=-1)
    cand_z = jnp.stack([_sgn(m02 + m20) * qx, _sgn(m12 + m21) * qy, qz, _sgn(m10 - m01) * qw], axis=-1)

    pivots = jnp.stack([qw, qx, qy, qz], axis=-1)
    k = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (...,4,4)
    q = jnp.take_along_axis(cands, k[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def _sgn(x):
    return jnp.where(x < 0, -1.0, 1.0)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Quaternion (x, y, z, w) -> (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
