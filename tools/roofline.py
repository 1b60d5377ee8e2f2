"""Single-chip MFU/roofline accounting for the two hot programs:
(a) the fused per-frame tracking program, (b) one detached-GBA LM chunk.

Uses XLA's compiled cost analysis (flops + bytes accessed) and measured
wall time to compute achieved fraction of peak. Peaks are TPU v5e (1 chip):
197 TFLOP/s bf16 / ~49 TFLOP/s f32(HIGHEST), 819 GB/s HBM.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor
from orb_slam2v2_1_tpu.models import frontend, loop_closing as lc_mod
from orb_slam2v2_1_tpu.ops import ba as ba_ops
from orb_slam2v2_1_tpu.utils import synthetic
from orb_slam2v2_1_tpu.utils.config import SlamConfig

PEAK_F32 = 49e12  # TPU v5e fp32 (HIGHEST-precision matmul path)
PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def log(*a):
    print(*a, flush=True)


def analyze(name, jitfn, args, kwargs=None, n_time=20):
    kwargs = kwargs or {}
    lowered = jitfn.lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_ = ca.get("bytes accessed", 0.0)
    # Warm + time (amortized chain, one fetch at the end).
    r = jitfn(*args, **kwargs)
    jax.device_get(jax.tree.leaves(r)[-1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n_time):
        r = jitfn(*args, **kwargs)
    jax.device_get(jax.tree.leaves(r)[-1].ravel()[:1])
    ms = (time.perf_counter() - t0) / n_time * 1e3
    tf = flops / (ms * 1e-3)
    gb = bytes_ / (ms * 1e-3)
    log(
        f"{name}: {ms:.2f} ms | {flops/1e9:.2f} GFLOP, {bytes_/1e6:.1f} MB "
        f"| achieved {tf/1e12:.2f} TFLOP/s ({tf/PEAK_F32*100:.1f}% f32 peak, "
        f"{tf/PEAK_BF16*100:.1f}% bf16 peak), {gb/1e9:.0f} GB/s "
        f"({gb/PEAK_HBM*100:.1f}% HBM peak)"
    )
    # Memory-bound floor: time to move the bytes at peak BW.
    log(
        f"    roofline floors: compute {flops/PEAK_F32*1e3:.3f} ms (f32) / "
        f"{flops/PEAK_BF16*1e3:.3f} ms (bf16), memory {bytes_/PEAK_HBM*1e3:.3f} ms"
        f" -> bound: {'memory' if bytes_/PEAK_HBM > flops/PEAK_F32 else 'compute'}"
    )
    return {"ms": ms, "flops": flops, "bytes": bytes_}


def main():
    cfg = SlamConfig(
        fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640, height=480,
        n_features=1000, max_keyframes=128, max_map_points=16384, fps=30.0,
        bf=44.0, th_depth=100.0,
    )
    rng = np.random.default_rng(7)
    scene = synthetic.make_desk(rng)
    poses = synthetic.desk_trajectory(12)
    poses = [p @ np.linalg.inv(poses[0]) for p in poses]
    K = jnp.asarray(cfg.K)
    frames = [
        synthetic.render(scene, jnp.asarray(T), K, cfg.width, cfg.height)
        for T in poses
    ]
    slam = SlamSystem(config=cfg, sensor=Sensor.RGBD)
    for i, (im, d) in enumerate(frames):
        slam.track_rgbd(im, d, timestamp=i / 30.0)
    im, d = frames[5]

    # (a) fused tracking program
    analyze(
        "fused_tracking(640x480,1000f)",
        frontend.process_frame_shared,
        (
            slam.map, im, d, slam.last_frame, slam._velocity_dev,
            jnp.asarray(True), jnp.int32(slam.ref_kf), slam._K, slam._dist,
            slam._bf, jnp.float32(slam._depth_limit), jnp.int32(99),
        ),
        dict(
            config=slam._orb_cfg, has_depth=True, width=cfg.width,
            height=cfg.height, mono=False, voc=slam.vocab, vo_points=False,
        ),
    )

    # (b) one GBA LM chunk at the kb=64 bucket
    prob, slots, used = lc_mod.build_global_ba_problem_compact(
        slam.map, slam._K, slam._bf, 64
    )
    analyze(
        "gba_lm_chunk(kb=64, 3 iters, cg=32)",
        ba_ops.ba_step_count_lam,
        (prob, jnp.float32(1e-4)),
        dict(iters=3, cg_iters=32, robust=True),
        n_time=5,
    )

    # Extraction alone, for the gap table.
    from orb_slam2v2_1_tpu.ops import orb

    analyze(
        "extract_orb(640x480,1000f)",
        jax.jit(lambda img: orb.extract_orb(img, slam._orb_cfg)),
        (im,),
    )


if __name__ == "__main__":
    sys.exit(main())
