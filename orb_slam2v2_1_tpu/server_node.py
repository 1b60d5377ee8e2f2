"""Map server CLI: the `server_node` executable analog (src/ros_server.cc:
201-210, CMakeLists.txt:238).

Accepts SLAM-client connections, mirrors their maps (ServerMap analog),
periodically reports per-client stats, and serves merged-map requests.

Usage:
  python -m orb_slam2v2_1_tpu.server_node --port 7007 [--max-kf 256]

Operator surface (the ServerViewer menu, src/ServerViewer.cc:56-139):
  python -m orb_slam2v2_1_tpu.server_node ctl --port 7007 list
  python -m orb_slam2v2_1_tpu.server_node ctl --port 7007 save --cid 1 --path m.npz
  python -m orb_slam2v2_1_tpu.server_node ctl --port 7007 load --cid 1 --path m.npz
  python -m orb_slam2v2_1_tpu.server_node ctl --port 7007 reset --cid 1
  python -m orb_slam2v2_1_tpu.server_node ctl --port 7007 send --cid 1 --merge-with 2
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ctl(argv):
    p = argparse.ArgumentParser(prog="server_node ctl",
                                description="map server operator commands")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7007)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    for name in ("reset", "save", "load", "send"):
        sp = sub.add_parser(name)
        sp.add_argument("--cid", type=int, required=True)
        if name in ("save", "load"):
            sp.add_argument("--path", required=True)
        if name == "send":
            sp.add_argument("--merge-with", type=int, default=None)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from .parallel.stream import OperatorClient

    op = OperatorClient(args.host, args.port)
    try:
        if args.cmd == "list":
            out = op.list_clients()
        elif args.cmd == "reset":
            out = op.reset(args.cid)
        elif args.cmd == "save":
            out = op.save(args.cid, args.path)
        elif args.cmd == "load":
            out = op.load(args.cid, args.path)
        else:
            out = op.send_merge(args.cid, args.merge_with)
    finally:
        op.close()
    print(json.dumps(out))
    return 0 if out.get("ok") else 1


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "ctl":
        return _ctl(argv[1:])
    p = argparse.ArgumentParser(description="TPU-native ORB-SLAM map server")
    p.add_argument("--port", type=int, default=7007)
    p.add_argument("--max-kf", type=int, default=256)
    p.add_argument("--max-mp", type=int, default=32768)
    p.add_argument("--n-kp", type=int, default=1024)
    p.add_argument("--report-s", type=float, default=5.0)
    p.add_argument("--save-dir", default=None,
                   help="directory for periodic per-client map snapshots")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # server is a host process

    from .parallel.stream import MapServerNode

    node = MapServerNode(args.port, args.max_kf, args.max_mp, args.n_kp)
    print(f"map server listening on :{node.port}", flush=True)
    try:
        while True:
            time.sleep(args.report_s)
            for cid, cm in sorted(node.server.clients.items()):
                st = cm.state
                print(
                    f"client {cid}: kf={int(st.n_kf)} mp={int(st.mp_valid.sum())} "
                    f"deltas={cm.n_deltas}",
                    flush=True,
                )
            if args.save_dir:
                from pathlib import Path

                from .utils import serialization

                out = Path(args.save_dir)
                out.mkdir(parents=True, exist_ok=True)
                for cid, cm in node.server.clients.items():
                    serialization.save_map(cm.state, out / f"client_{cid}.npz")
    except KeyboardInterrupt:
        pass
    finally:
        node.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
