#!/usr/bin/env python3
"""Persistent warm-TPU job worker (dev tool).

The axon tunnel pays a several-hundred-second warm-up on the FIRST
device fetch of every process, which makes iterative kernel profiling
unbearable.  This worker pays it once, then polls /tmp/tpu_jobs/ for
job files: `<name>.py` is exec'd in a persistent globals dict (so
device arrays / compiled functions carry over between jobs), stdout +
stderr + traceback go to `<name>.py.out`, and the job file is renamed
to `<name>.py.done`.  Submit with:

    cp myjob.py /tmp/tpu_jobs/j01.py      # names run in sorted order
    cat /tmp/tpu_jobs/j01.py.out          # poll for this file

Stop it by PID (it writes /tmp/tpu_jobs/worker.pid).
"""

import io
import os
import sys
import time
import traceback
from contextlib import redirect_stdout, redirect_stderr

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = "/tmp/tpu_jobs"


def main():
    os.makedirs(JOBS, exist_ok=True)
    with open(os.path.join(JOBS, "worker.pid"), "w") as fh:
        fh.write(str(os.getpid()))

    import jax
    import jax.numpy as jnp
    t0 = time.time()
    float(jnp.zeros(()) + 1.0)
    print(f"warm-up fetch: {time.time() - t0:.1f}s on "
          f"{jax.devices()}", flush=True)

    g: dict = {"__name__": "__tpu_worker__"}
    while True:
        for f in sorted(os.listdir(JOBS)):
            if not f.endswith(".py"):
                continue
            p = os.path.join(JOBS, f)
            src = open(p).read()
            os.rename(p, p + ".done")
            buf = io.StringIO()
            t0 = time.time()
            try:
                with redirect_stdout(buf), redirect_stderr(buf):
                    exec(compile(src, f, "exec"), g)
            except BaseException:
                buf.write(traceback.format_exc())
            buf.write(f"\n# job wall: {time.time() - t0:.1f}s\n")
            with open(p + ".out", "w") as fh:
                fh.write(buf.getvalue())
            print(f"done {f} in {time.time() - t0:.1f}s", flush=True)
        time.sleep(1)


if __name__ == "__main__":
    main()
