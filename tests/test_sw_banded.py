"""Banded extension: XLA twin vs Pallas relative-diagonal kernel.

Strict-band semantics (H and F dead outside |j - R| <= band, row 0
included — ksw_extend's static band, /root/reference/src/
BWAAligner.cpp:75-80 passes mem_opt_t.w) pinned three ways: scalar
oracle -> XLA, XLA -> Pallas (interpret), and band-superset sanity
(rectangle score >= banded score, equal when the optimum stays in
band).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from seqlib_tpu.ops.sw import NEG, extend_batch  # noqa: E402
from seqlib_tpu.ops.sw_pallas import extend_batch_pallas_banded  # noqa: E402


def _mk_batch(rng, B, Lq, Lt):
    q = rng.integers(0, 5, (B, Lq)).astype(np.int8)
    t = rng.integers(0, 5, (B, Lt)).astype(np.int8)
    for b in range(0, B, 2):
        ql_ = int(rng.integers(10, Lq))
        p = int(rng.integers(0, Lt - ql_))
        t[b, p:p + ql_] = q[b, :ql_]
        if rng.random() < 0.7:
            t[b, p + int(rng.integers(0, ql_))] = rng.integers(0, 4)
    ql = rng.integers(1, Lq + 1, B).astype(np.int32)
    tl = rng.integers(1, Lt + 1, B).astype(np.int32)
    h0 = rng.integers(1, 60, B).astype(np.int32)
    return q, ql, t, tl, h0


def _scalar_banded(q, t, ql, tl, h0, od, ed, oi, ei, ma, mi, w):
    """Strict-band scalar oracle; returns (score, last-row H)."""
    H = np.full(tl + 1, NEG, np.int64)
    F = np.full(tl + 1, NEG, np.int64)
    for j in range(min(tl, w) + 1):
        v = h0 if j == 0 else h0 - od - ed * j
        H[j] = v if (j == 0 or v >= 0) else NEG
    best = 0
    for i in range(ql):
        R = i + 1
        Hn = np.full(tl + 1, NEG, np.int64)
        Fn = np.full(tl + 1, NEG, np.int64)
        for j in range(tl + 1):
            f = max(H[j] - (oi + ei), F[j] - ei)
            if abs(j - R) > w:
                f = NEG
            Fn[j] = f
            if j >= 1:
                sub = ma if (t[j - 1] == q[i] and t[j - 1] < 4
                             and q[i] < 4) else -mi
                hnd = max(H[j - 1] + sub, f)
            else:
                hnd = f
            Hn[j] = hnd if abs(j - R) <= w else NEG
        run = NEG
        for j in range(tl + 1):
            e = run - od - ed * j
            run = max(run, Hn[j] + ed * j)
            Hn[j] = max(Hn[j], e) if abs(j - R) <= w else NEG
        H, F = Hn, Fn
        best = max(best, max(int(H[j]) for j in range(1, tl + 1))
                   if tl >= 1 else 0)
    return best, H


@pytest.mark.parametrize("band,zdrop", [(8, 0), (12, 23), (100, 100)])
def test_banded_pallas_vs_xla(band, zdrop):
    rng = np.random.default_rng(band * 100 + zdrop)
    Lq, Lt = (96, 160) if band == 100 else (48, 80)
    q, ql, t, tl, h0 = _mk_batch(rng, 64, Lq, Lt)
    a = extend_batch(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
                     jnp.asarray(tl), jnp.asarray(h0),
                     zdrop=zdrop, band=band)
    b = extend_batch_pallas_banded(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
        jnp.asarray(tl), jnp.asarray(h0), zdrop=zdrop, band=band,
        interpret=jax.default_backend() == "cpu")
    for k in ("score", "qle", "tle", "gscore", "gtle"):
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        if k == "gtle":   # undefined when gscore is the not-found
            sel = np.asarray(a["gscore"]) > 0      # sentinel
            av, bv = av[sel], bv[sel]
        np.testing.assert_array_equal(av, bv, err_msg=k)


def test_banded_xla_vs_scalar_oracle():
    rng = np.random.default_rng(3)
    q, ql, t, tl, h0 = _mk_batch(rng, 16, 40, 64)
    w = 10
    a = extend_batch(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
                     jnp.asarray(tl), jnp.asarray(h0), band=w)
    for b in range(16):
        want, _ = _scalar_banded(q[b], t[b], int(ql[b]), int(tl[b]),
                                 int(h0[b]), 6, 1, 6, 1, 1, 4, w)
        assert int(np.asarray(a["score"])[b]) == want, b


def test_band_is_a_tightening():
    """Rectangle optimum >= banded optimum; equal on near-diagonal
    alignments (the production regime: alignments never approach a
    100-wide band on 150 bp reads)."""
    rng = np.random.default_rng(4)
    q, ql, t, tl, h0 = _mk_batch(rng, 64, 48, 80)
    full = extend_batch(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
                        jnp.asarray(tl), jnp.asarray(h0))
    banded = extend_batch(jnp.asarray(q), jnp.asarray(ql),
                          jnp.asarray(t), jnp.asarray(tl),
                          jnp.asarray(h0), band=47)
    assert (np.asarray(banded["score"])
            <= np.asarray(full["score"])).all()
    wide = extend_batch(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
                        jnp.asarray(tl), jnp.asarray(h0), band=200)
    np.testing.assert_array_equal(np.asarray(wide["score"]),
                                  np.asarray(full["score"]))
