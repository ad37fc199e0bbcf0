"""Persistent TPU Python worker: pays the platform init once, then
executes snippet files dropped into /tmp/tpuq/ (in name order),
writing each snippet's stdout/stderr + result to <name>.out.

Usage:  python scripts/tpu_worker.py &          # once
        echo 'print(1+1)' > /tmp/tpuq/j01.py    # enqueue
        cat /tmp/tpuq/j01.py.out                # poll for this file

A snippet runs in a SHARED namespace (globals persist across
snippets), so later jobs reuse warm jitted functions.  Write the file
atomically (write to tmp name, then rename) to avoid partial reads.
"""
import io
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

QDIR = "/tmp/tpuq"
os.makedirs(QDIR, exist_ok=True)

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
t0 = time.time()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
np.asarray(jnp.ones(8) + 1)
print(f"worker ready, platform init {time.time()-t0:.1f}s on "
      f"{jax.devices()[0]}", flush=True)

G: dict = {"np": np, "jax": jax, "jnp": jnp, "time": time}
done = set()
while True:
    jobs = sorted(f for f in os.listdir(QDIR)
                  if f.endswith(".py") and f not in done)
    if not jobs:
        time.sleep(0.3)
        continue
    for j in jobs:
        done.add(j)
        path = os.path.join(QDIR, j)
        buf = io.StringIO()
        old_out, old_err = sys.stdout, sys.stderr
        sys.stdout = sys.stderr = buf
        try:
            code = open(path).read()
            exec(compile(code, path, "exec"), G)
            status = "OK"
        except SystemExit:
            sys.stdout, sys.stderr = old_out, old_err
            open(path + ".out", "w").write(buf.getvalue() + "\nEXIT\n")
            print(f"{j}: EXIT", flush=True)
            raise
        except Exception:
            traceback.print_exc()
            status = "FAIL"
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        open(path + ".out", "w").write(buf.getvalue() + f"\n{status}\n")
        print(f"{j}: {status}", flush=True)
