"""Measure the detached-GBA LM chunk: matrix-free Schur-PCG vs explicit
dense reduced-camera solve, at the production compact-GBA shapes
(C = kb bucket, P = max_map_points, O = kb * n_features).

PERF.md gap 3(a): the CG chunk is latency-bound (32 sequential matvecs per
LM iteration on a <=768-unknown reduced system); the dense path replaces
them with one MXU matmul + Cholesky. This prints the crossover data that
justifies (or retires) routing GlobalBARunner through dense=True.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.ops import ba, lie


def synth_problem(rng, C, P, N):
    """Production-shaped GBA problem: C cameras on an arc observing a cloud
    of P candidate points, O = C*N observation slots, ~60% valid."""
    pts = jnp.asarray(rng.uniform(-4, 4, (P, 3)).astype(np.float32))
    pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 2.0)
    poses = []
    for i in range(C):
        tw = jnp.asarray(
            [0.02 * i, 0.0, -0.01 * i, 0.4 * np.sin(i * 0.2), 0.02 * i, 0.0],
            jnp.float32,
        )
        poses.append(lie.se3_exp(tw[None])[0])
    poses = jnp.stack(poses)
    O = C * N
    cam_idx = jnp.repeat(jnp.arange(C, dtype=jnp.int32), N)
    pt_idx = jnp.asarray(rng.integers(0, P, O).astype(np.int32))
    K = jnp.asarray([550.0, 550.0, 320.0, 240.0], jnp.float32)
    bf = jnp.float32(44.0)
    pc = (poses[cam_idx] @ jnp.concatenate(
        [pts[pt_idx], jnp.ones((O, 1))], -1)[..., None])[:, :3, 0]
    z = jnp.maximum(pc[:, 2], 0.3)
    u = K[0] * pc[:, 0] / z + K[2]
    v = K[1] * pc[:, 1] / z + K[3]
    ur = u - bf / z
    noise = jnp.asarray(rng.normal(0, 0.7, (O, 3)).astype(np.float32))
    target = jnp.stack([u, v, ur], -1) + noise
    valid = jnp.asarray(rng.uniform(size=O) < 0.6) & (pc[:, 2] > 0.3)
    obs = ba.Obs(
        cam_idx=cam_idx, pt_idx=pt_idx, target=target,
        inv_sigma2=jnp.ones(O, jnp.float32),
        is_stereo=jnp.ones(O, bool), valid=valid,
    )
    poses_n = lie.se3_exp(
        jnp.asarray(rng.normal(0, 0.005, (C, 6)).astype(np.float32))
    ) @ poses
    pts_n = pts + jnp.asarray(rng.normal(0, 0.01, (P, 3)).astype(np.float32))
    fixed = jnp.zeros(C, bool).at[0].set(True)
    return ba.BAProblem(
        poses=jnp.where(fixed[:, None, None], poses, poses_n),
        points=pts_n, obs=obs, cam_fixed=fixed, K=K, bf=bf,
    )


def timeit(fn, *args, n=10, **kw):
    # Fetch a scalar to synchronize: through the axon tunnel
    # block_until_ready does not actually wait on device completion.
    r = fn(*args, **kw)
    jax.device_get(r[1])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.device_get(r[1])
    return (time.perf_counter() - t0) / n * 1e3, r


def main():
    rng = np.random.default_rng(5)
    for C, P, N in [(16, 16384, 1000), (32, 16384, 1000), (64, 16384, 1000),
                    (128, 16384, 1000)]:
        prob = synth_problem(rng, C, P, N)
        lam = jnp.float32(1e-4)
        ms_cg, (p_cg, c_cg, _, _) = timeit(
            ba.ba_step_count_lam, prob, lam, iters=3, cg_iters=32, robust=True
        )
        ms_d, (p_d, c_d, _, _) = timeit(
            ba.ba_step_count_lam, prob, lam, iters=3, robust=True, dense=True
        )
        print(
            f"C={C:4d} P={P} O={C * N}: cg32 {ms_cg:8.1f} ms (cost {float(c_cg):.1f})"
            f" | dense {ms_d:8.1f} ms (cost {float(c_d):.1f})"
            f" | speedup {ms_cg / ms_d:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
