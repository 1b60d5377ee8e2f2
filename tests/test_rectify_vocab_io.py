"""Tests: stereo rectification, DBoW2 text vocab interop, EuRoC loader,
pose-graph/odometry export (reference parity: src/ros_stereo.cc:71-116,
TemplatedVocabulary.h:1351-1464, src/ros_rgbd.cc:67-108, src/Tracking.cc:528-557)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2v2_1_tpu.ops import rectify, vocab
from orb_slam2v2_1_tpu.ops.undistort import distort_normalized


def _project(K, D, R_wc, t_wc, pts):
    pc = pts @ R_wc.T + t_wc
    xn = pc[:, :2] / pc[:, 2:3]
    xd = np.asarray(distort_normalized(jnp.asarray(xn), jnp.asarray(D)))
    return np.stack([K[0, 0] * xd[:, 0] + K[0, 2], K[1, 1] * xd[:, 1] + K[1, 2]], -1)


class TestStereoRectify:
    def _rig(self):
        K1 = np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1.0]])
        K2 = np.array([[457.5, 0, 379.0], [0, 456.0, 255.0], [0, 0, 1.0]])
        D1 = np.array([-0.28, 0.07, 1e-4, 1e-5, 0.0])
        D2 = np.array([-0.28, 0.075, -1e-4, -2e-5, 0.0])
        # Slightly rotated right camera, ~11 cm baseline (EuRoC-like).
        w = np.array([0.002, -0.014, 0.0005])
        th = np.linalg.norm(w)
        k = w / th
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)
        T = np.array([-0.110, 0.0004, -0.0008])
        return K1, D1, K2, D2, R, T

    def test_epipolar_rows_align(self):
        """After rectification, corresponding keypoints share a row and the
        disparity matches fx*b/z."""
        K1, D1, K2, D2, R, T = self._rig()
        size = (752, 480)
        cal = rectify.stereo_rectify(K1, D1, K2, D2, R, T, size)

        rng = np.random.default_rng(0)
        pts_l = np.stack(
            [rng.uniform(-1, 1, 50), rng.uniform(-0.7, 0.7, 50), rng.uniform(3, 8, 50)],
            -1,
        )  # in LEFT cam coords
        # Original projections.
        uv_l = _project(K1, D1, np.eye(3), np.zeros(3), pts_l)
        uv_r = _project(K2, D2, R, T, pts_l)

        # Rectified projections through the analytic model (no images needed):
        # rectified ray = R_rect @ original normalized ray.
        def rect_uv(uv, K_src, D_src, R_rect):
            # invert distortion to normalized, rotate, project through K_new.
            from orb_slam2v2_1_tpu.ops.undistort import undistort_points

            Kv = jnp.asarray([K_src[0, 0], K_src[1, 1], K_src[0, 2], K_src[1, 2]])
            und = np.asarray(
                undistort_points(jnp.asarray(uv, jnp.float32), Kv, jnp.asarray(D_src))
            )
            xn = (und - [K_src[0, 2], K_src[1, 2]]) / [K_src[0, 0], K_src[1, 1]]
            rays = np.concatenate([xn, np.ones((len(xn), 1))], -1) @ R_rect.T
            xy = rays[:, :2] / rays[:, 2:3]
            Kn = cal["K_new"]
            return np.stack([Kn[0, 0] * xy[:, 0] + Kn[0, 2],
                             Kn[1, 1] * xy[:, 1] + Kn[1, 2]], -1)

        ruv_l = rect_uv(uv_l, K1, D1, cal["R1"])
        ruv_r = rect_uv(uv_r, K2, D2, cal["R2"])
        # Same row (sub-pixel), positive disparity = fx*b/z of the rectified frame.
        assert np.abs(ruv_l[:, 1] - ruv_r[:, 1]).max() < 0.1
        disp = ruv_l[:, 0] - ruv_r[:, 0]
        z_rect = (cal["R1"] @ pts_l.T).T[:, 2]
        expected = cal["bf"] / z_rect
        assert np.abs(disp - expected).max() < 0.15

    def test_remap_identity(self):
        img = np.arange(32 * 48, dtype=np.float32).reshape(32, 48)
        u, v = np.meshgrid(np.arange(48, dtype=np.float32),
                           np.arange(32, dtype=np.float32))
        m = jnp.asarray(np.stack([u, v], -1))
        out = np.asarray(rectify.remap_bilinear(jnp.asarray(img), m))
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_rectifier_end_to_end(self):
        """Remapped synthetic images: a bright dot at a known 3D point lands on
        the same row in both rectified images."""
        K1, D1, K2, D2, R, T = self._rig()
        size = (128, 96)
        # Scale intrinsics to the small test image.
        s = np.diag([128 / 752.0, 96 / 480.0, 1.0])
        K1s, K2s = s @ K1, s @ K2
        rec = rectify.StereoRectifier(K1s, D1, K2s, D2, R, T, size)
        pt = np.array([[0.2, -0.1, 4.0]])
        uv_l = _project(K1s, D1, np.eye(3), np.zeros(3), pt)[0]
        uv_r = _project(K2s, D2, R, T, pt)[0]
        img_l = np.zeros((96, 128), np.float32)
        img_r = np.zeros((96, 128), np.float32)
        img_l[int(round(uv_l[1])), int(round(uv_l[0]))] = 255.0
        img_r[int(round(uv_r[1])), int(round(uv_r[0]))] = 255.0
        out_l, out_r = rec(img_l, img_r)
        yl = np.unravel_index(np.argmax(np.asarray(out_l)), out_l.shape)[0]
        yr = np.unravel_index(np.argmax(np.asarray(out_r)), out_r.shape)[0]
        assert abs(yl - yr) <= 1


class TestVocabTextIO:
    def test_roundtrip(self, tmp_path, rng):
        descs = rng.integers(0, 2**32, (400, 8), dtype=np.uint32)
        voc_npz = vocab.train_vocabulary(descs, rng)
        path = tmp_path / "voc.txt"
        vocab.export_dbow2_text(voc_npz, path)
        imported = vocab.import_dbow2_text(path)
        native = vocab.load_vocabulary(voc_npz)

        bits = np.unpackbits(descs.view(np.uint8), axis=1, bitorder="little")
        pm1 = jnp.asarray(bits.astype(np.float32) * 2 - 1, jnp.bfloat16)
        w_native = np.asarray(vocab.assign_words(native, pm1))
        w_imported = np.asarray(vocab.assign_words(imported, pm1))
        np.testing.assert_array_equal(w_native, w_imported)
        # Leaf weights preserved.
        np.testing.assert_allclose(
            np.asarray(imported.word_weight), np.asarray(native.word_weight),
            rtol=1e-5, atol=1e-6,
        )

    def test_truncated_deeper_tree(self, tmp_path, rng):
        """A hand-written depth-5 (> LEVELS=4) incomplete text vocab imports
        truncated to depth 4: depth-4 ancestors absorb descendant leaf
        weights, a shallow depth-2 leaf is replicated down, node_valid masks
        the holes, and descent routes every descriptor to a valid word."""
        lines = []
        node_id = 0

        def emit(parent, leaf, byts, weight):
            nonlocal node_id
            node_id += 1
            lines.append(
                f"{parent} {int(leaf)} "
                + " ".join(str(int(b)) for b in byts) + f" {weight}"
            )
            return node_id

        d_a = np.zeros(32, np.uint8)          # all-zero descriptor
        d_b = np.full(32, 255, np.uint8)      # all-one descriptor
        d_mid = np.r_[np.full(16, 255, np.uint8), np.zeros(16, np.uint8)]

        # Branch A: chain to depth 5 — two depth-5 leaves under one depth-4
        # node; their weights must merge into that node's word slot.
        a1 = emit(0, 0, d_a, 0.0)             # depth 1
        a2 = emit(a1, 0, d_a, 0.0)            # depth 2
        a3 = emit(a2, 0, d_a, 0.0)            # depth 3
        a4 = emit(a3, 0, d_a, 0.0)            # depth 4 -> truncation word
        emit(a4, 1, d_a, 0.25)                # depth 5 leaf
        emit(a4, 1, d_mid, 0.5)               # depth 5 leaf (sibling)
        # Branch B: shallow leaf at depth 2 -> replicated down to depth 4.
        b1 = emit(0, 0, d_b, 0.0)             # depth 1, rank 1
        emit(b1, 1, d_b, 2.0)                 # depth 2 LEAF (shallow)

        path = tmp_path / "voc5.txt"
        path.write_text("10 5 0 0\n" + "\n".join(lines) + "\n")
        imported = vocab.import_dbow2_text(path)

        # Incomplete-tree masking present, tf-idf mass preserved exactly.
        assert imported.node_valid, "expected node_valid masks for holes"
        total = float(np.asarray(imported.word_weight).sum())
        assert abs(total - 2.75) < 1e-6
        # Word slots: branch A = slot 0 chain (rank 0 everywhere) with merged
        # weight; branch B leaf at depth-2 slot 10 -> depth-4 slot 10*100.
        w = np.asarray(imported.word_weight)
        assert abs(w[0] - 0.75) < 1e-6
        assert abs(w[10 * 100] - 2.0) < 1e-6
        # Descent only reaches valid nodes: an all-one query lands on the
        # replicated branch-B word, an all-zero query on branch A's word.
        q = np.stack([np.zeros(256, np.float32) - 1, np.zeros(256, np.float32) + 1])
        words = np.asarray(vocab.assign_words(imported, jnp.asarray(q, jnp.bfloat16)))
        assert words[0] == 0 and words[1] == 10 * 100
        valid_words = np.nonzero(np.asarray(imported.node_valid[-1]))[0]
        assert set(words.tolist()) <= set(valid_words.tolist())


class TestEurocLoader:
    def test_load(self, tmp_path):
        from orb_slam2v2_1_tpu.utils import datasets

        root = tmp_path / "MH01"
        for cam in ("cam0", "cam1"):
            (root / "mav0" / cam / "data").mkdir(parents=True)
            rows = ["#timestamp [ns],filename"]
            for i in range(5):
                ts = 1403636579763555584 + i * 50_000_000
                rows.append(f"{ts},{ts}.png")
            (root / "mav0" / cam / "data.csv").write_text("\n".join(rows))
        gtd = root / "mav0" / "state_groundtruth_estimate0"
        gtd.mkdir(parents=True)
        gtd.joinpath("data.csv").write_text(
            "#ts,x,y,z,qw,qx,qy,qz\n"
            "1403636579763555584,1.0,2.0,3.0,1.0,0.0,0.0,0.0\n"
        )
        # Known body->cam0 extrinsic: 90° about z plus an offset. The loader
        # must return camera (not body) poses: Twc = T_WB @ T_BS.
        T_BS = np.array(
            [[0.0, -1.0, 0.0, 0.1],
             [1.0, 0.0, 0.0, 0.2],
             [0.0, 0.0, 1.0, -0.3],
             [0.0, 0.0, 0.0, 1.0]]
        )
        (root / "mav0" / "cam0" / "sensor.yaml").write_text(
            "sensor_type: camera\nT_BS:\n  cols: 4\n  rows: 4\n  data: ["
            + ", ".join(str(v) for v in T_BS.reshape(-1)) + "]\n"
        )
        pairs, gt = datasets.load_euroc_stereo(root)
        assert len(pairs) == 5
        assert pairs[0]["left"].name == pairs[0]["right"].name
        assert len(gt) == 1
        Twc = next(iter(gt.values()))
        # T_WB is identity rotation at [1,2,3], so Twc == translate+T_BS.
        expected = np.eye(4)
        expected[:3, 3] = [1.0, 2.0, 3.0]
        np.testing.assert_allclose(Twc, expected @ T_BS, atol=1e-6)


class TestGraphExport:
    def test_pose_array_graph_and_odom(self):
        from orb_slam2v2_1_tpu.models.system import SlamSystem, Sensor
        from orb_slam2v2_1_tpu.utils import synthetic
        from orb_slam2v2_1_tpu.utils.config import SlamConfig

        # StereoInitialization needs >500 keypoints (src/Tracking.cc:652), so
        # use the full-resolution e2e config.
        cfg = SlamConfig(fx=550.0, fy=550.0, cx=320.0, cy=240.0, width=640,
                         height=480, n_features=1000, max_keyframes=64,
                         max_map_points=16384, fps=10.0, bf=44.0, th_depth=40.0)
        rng = np.random.default_rng(3)
        scene = synthetic.make_desk(rng)
        poses = synthetic.desk_trajectory(8)
        poses = [p @ np.linalg.inv(poses[0]) for p in poses]
        sys = SlamSystem(config=cfg, sensor=Sensor.RGBD, async_mapping=False)
        K = jnp.asarray(cfg.K)
        for i, Tcw in enumerate(poses):
            img, depth = synthetic.render(scene, jnp.asarray(Tcw), K,
                                          cfg.width, cfg.height)
            sys.track_rgbd(np.asarray(img), np.asarray(depth), i / 30.0)
        arr = sys.get_pose_array()
        assert len(arr) >= 1 and arr[0].shape == (4, 4)
        g = sys.get_graph()
        assert g["posesId"] and len(g["poses"]) == len(g["posesId"])
        assert len(g["links"]) == len(g["posesId"]) - 1
        # Odom chain followed the camera (no loop closures here, so odom pose
        # ~ tracked pose).
        assert sys.odom_pose is not None
        est = sys.odom_pose
        np.testing.assert_allclose(est[:3, 3], poses[-1][:3, 3], atol=0.05)
