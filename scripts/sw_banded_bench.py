"""One-session TPU sweep: production rectangle Pallas kernel vs the
banded relative-diagonal kernel (v5), exactness-checked against their
XLA twins before timing.  Axon tunnel variance is +-15-25% BETWEEN
sessions, so both variants are timed in THIS process back to back.

Run: python scripts/sw_banded_bench.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
from seqlib_tpu.ops.sw import extend_batch
from seqlib_tpu.ops.sw_pallas import extend_batch_pallas, extend_batch_pallas_banded

B, Lq, Lt, ZD, W = 1024, 150, 250, 100, 100
rng = np.random.default_rng(0)
q = jnp.asarray(rng.integers(0, 4, (B, Lq)).astype(np.int8))
t = jnp.asarray(rng.integers(0, 4, (B, Lt)).astype(np.int8))
ql = jnp.full(B, Lq, jnp.int32)
tl = jnp.full(B, Lt, jnp.int32)
h0 = jnp.full(B, 30, jnp.int32)

def cells_full():
    return B * Lq * Lt

def cells_banded():
    # strict band |j-R|<=W: per row R, columns [max(0,R-W), min(Lt,R+W)]
    tot = 0
    for R in range(1, Lq + 1):
        tot += max(0, min(Lt, R + W) - max(0, R - W) + 1)
    return B * tot

def run(name, fn, n=30, **kw):
    # exactness vs XLA twin first
    ref = {k: np.asarray(v) for k, v in extend_batch(
        q, ql, t, tl, h0, zdrop=ZD, **kw).items()}
    out = {k: np.asarray(v) for k, v in fn(q, ql, t, tl, h0,
                                           zdrop=ZD, **kw).items()}
    for k in ref:
        a, b = ref[k], out[k]
        if k == "gtle":
            sel = ref["gscore"] > 0
            a, b = a[sel], b[sel]
        assert np.array_equal(a, b), (name, k)
    # time
    int(jnp.sum(fn(q, ql, t, tl, h0, zdrop=ZD, **kw)["score"]))
    t0 = time.time()
    for _ in range(n):
        s = fn(q, ql, t, tl, h0, zdrop=ZD, **kw)
    int(jnp.sum(s["score"]))
    dt = (time.time() - t0) / n
    return dt

print("device:", jax.devices()[0], file=sys.stderr)
dt_full = run("rect", extend_batch_pallas)
dt_band = run("band", extend_batch_pallas_banded, band=W)
cf, cb = cells_full(), cells_banded()
print(f"rectangle: {dt_full*1e3:.2f} ms/call, {cf/dt_full/1e9:.1f} Gcells/s "
      f"({cf/1e6:.1f} M rect cells)")
print(f"banded   : {dt_band*1e3:.2f} ms/call, {cb/dt_band/1e9:.1f} Gcells/s "
      f"({cb/1e6:.1f} M banded cells; {cf/cb:.2f}x fewer than rect)")
print(f"wall-time speedup rect->banded: {dt_full/dt_band:.2f}x")
