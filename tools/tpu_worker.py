"""Persistent TPU job worker.

The axon TPU backend takes minutes to initialize per process; this worker
pays that cost once and then executes job files submitted to /tmp/tpu_jobs.

Usage:
    python tools/tpu_worker.py &            # once per session
    cp job.py /tmp/tpu_jobs/myjob.py        # submit
    cat /tmp/tpu_jobs/myjob.out             # result (written atomically,
                                            #   .done marker on completion)

Each job runs via exec() in a fresh namespace sharing the initialized JAX
runtime. stdout/stderr are captured to the .out file.
"""

import contextlib
import io
import os
import time
import traceback

JOB_DIR = "/tmp/tpu_jobs"


def main():
    os.makedirs(JOB_DIR, exist_ok=True)
    import jax

    print("initializing TPU backend...", flush=True)
    t0 = time.time()
    devs = jax.devices()
    print(f"ready: {devs} in {time.time() - t0:.1f}s", flush=True)
    with open(os.path.join(JOB_DIR, "READY"), "w") as f:
        f.write(str(devs))

    seen = set()
    while True:
        for name in sorted(os.listdir(JOB_DIR)):
            if not name.endswith(".py") or name in seen:
                continue
            seen.add(name)
            path = os.path.join(JOB_DIR, name)
            out_path = path[:-3] + ".out"
            buf = io.StringIO()
            t0 = time.time()
            try:
                with open(path) as f:
                    src = f.read()
                with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                    exec(compile(src, path, "exec"), {"__name__": "__tpu_job__"})
                status = "OK"
            except BaseException:
                buf.write(traceback.format_exc())
                status = "ERROR"
            with open(out_path + ".tmp", "w") as f:
                f.write(buf.getvalue())
                f.write(f"\n[{status} in {time.time() - t0:.1f}s]\n")
            os.replace(out_path + ".tmp", out_path)
            with open(path[:-3] + ".done", "w") as f:
                f.write(status)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
