"""Multi-PROCESS distribution on one host (SURVEY §4 "multi-host without a
cluster"; VERDICT r4 item 5): two OS processes join a jax.distributed
coordinator (CPU backend, 4 virtual devices each -> one 8-device global
mesh), run the psum-sharded GBA solve on process-local shards, check cost
parity against the single-device engine, and exchange a map over the TCP
client/server transport between the two processes — the analog of the
reference's separate ROS client/server processes
(launch/server.launch:9-21)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys, time
    pid = int(sys.argv[1]); coord = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coord, num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental import multihost_utils as mhu

    from orb_slam2v2_1_tpu.ops import ba
    from orb_slam2v2_1_tpu.parallel import dist_ba

    assert jax.device_count() == 8, jax.device_count()
    assert jax.process_count() == 2
    mesh = Mesh(np.array(jax.devices()), ("obs",))

    # --- same seeded BA problem in both processes ---------------------------
    rng = np.random.default_rng(5)
    C, Pn, O = 8, 256, 4096
    angles = np.linspace(0, 2 * np.pi, C, endpoint=False)
    poses = []
    for a in angles:
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1 * np.cos(a), 0.1 * np.sin(a), 0.0]
        poses.append(T)
    poses = np.stack(poses)
    pts = rng.uniform(-1, 1, (Pn, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    K = np.array([500.0, 500.0, 320.0, 240.0], np.float32)
    bf = np.float32(40.0)
    cam_idx = rng.integers(0, C, O).astype(np.int32)
    pt_idx = rng.integers(0, Pn, O).astype(np.int32)
    Tc = poses[cam_idx]
    pc = np.einsum("oij,oj->oi", Tc[:, :3, :3], pts[pt_idx]) + Tc[:, :3, 3]
    u = K[0] * pc[:, 0] / pc[:, 2] + K[2]
    v = K[1] * pc[:, 1] / pc[:, 2] + K[3]
    ur = u - bf / pc[:, 2]
    target = np.stack([u, v, ur], -1).astype(np.float32)
    target[:, :2] += rng.normal(0, 0.5, (O, 2))
    obs = ba.Obs(
        cam_idx=cam_idx, pt_idx=pt_idx, target=target,
        inv_sigma2=np.ones(O, np.float32),
        is_stereo=np.ones(O, bool), valid=np.ones(O, bool),
    )
    pts_noisy = (pts + rng.normal(0, 0.02, pts.shape)).astype(np.float32)
    cam_fixed = np.zeros(C, bool); cam_fixed[0] = True

    # --- single-device reference cost (local jit, any one process) ---------
    prob = ba.BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(pts_noisy),
        obs=jax.tree.map(jnp.asarray, obs), cam_fixed=jnp.asarray(cam_fixed),
        K=jnp.asarray(K), bf=jnp.float32(bf),
    )
    prob_ref, cost_ref = ba.bundle_adjust(prob, cg_iters=32)
    cost_ref = float(cost_ref)

    # --- sharded solve on process-local shards ------------------------------
    half = O // 2
    sl = slice(pid * half, (pid + 1) * half)
    obs_local = jax.tree.map(lambda x: x[sl], obs)
    obs_g = jax.tree.map(
        lambda x: mhu.host_local_array_to_global_array(x, mesh, P("obs")),
        obs_local,
    )
    rep = lambda x: mhu.host_local_array_to_global_array(np.asarray(x), mesh, P())
    solve = dist_ba.make_sharded_bundle_adjust(mesh, cg_iters=32)
    poses_o, points_o, valid_o, cost_o = solve(
        rep(poses), rep(pts_noisy), obs_g, rep(cam_fixed), rep(K),
        rep(np.float32(bf)),
    )
    cost_sharded = float(cost_o)
    rel = abs(cost_sharded - cost_ref) / max(cost_ref, 1e-9)
    print(f"p{pid}: cost ref={cost_ref:.4f} sharded={cost_sharded:.4f} rel={rel:.4f}",
          flush=True)
    assert rel < 0.05, (cost_ref, cost_sharded)

    # --- two-process TCP client/server map exchange -------------------------
    from orb_slam2v2_1_tpu.models.map_state import empty_map, append_keyframe
    from orb_slam2v2_1_tpu.parallel.stream import MapServerNode, StreamClient

    if pid == 0:
        node = MapServerNode(port=0, max_kf=16, max_mp=512, n_kp=64)
        port = node.port
    else:
        node = None
        port = 0
    port = int(mhu.broadcast_one_to_all(np.int32(port)))
    if pid == 1:
        st = empty_map(8, 256, 64)
        r2 = np.random.default_rng(3)
        for k in range(2):
            st, kf_id = append_keyframe(
                st, jnp.eye(4), jnp.int32(k),
                jnp.asarray(r2.uniform(30, 600, (64, 2)).astype(np.float32)),
                jnp.zeros(64, jnp.int32), jnp.zeros(64, jnp.float32),
                jnp.asarray(r2.integers(0, 2**32, (64, 8), dtype=np.int64).astype(np.uint32)),
                jnp.ones(64, bool), jnp.full(64, -1.0, jnp.float32),
                jnp.full(64, -1, jnp.int32),
            )
        client = StreamClient("127.0.0.1", port, cid=7)
        for k in range(2):
            client.send_keyframe(st, k)
        client.flush()
        client.close()
    if pid == 0:
        for _ in range(500):
            if node.n_deltas >= 2:
                break
            time.sleep(0.02)
        assert node.n_deltas >= 2, node.n_deltas
        assert int(node.server.client_map(7).n_kf) == 2
    mhu.sync_global_devices("tcp-done")
    if node is not None:
        node.stop()
    print(f"p{pid}: OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_sharded_gba_and_tcp_merge(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"p{pid}: OK" in out
