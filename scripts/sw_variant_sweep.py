"""SW extension-kernel variant sweep (round-4 experiments).

Reproduces the measured table in docs/SW_SPEED_OF_LIGHT.md: the
production v2 kernel vs exact variants — op-trimmed, blocked E-scan
(5-step within-32 + small-array carry), wider lane tiles, and
NCH-way interleaved independent row-chains.  Every variant asserts
bit-exact outputs against ops.sw.extend_batch before timing.

Run on a TPU:  python scripts/sw_variant_sweep.py
"""

import os, sys, time, functools
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG16 = -16384

def make_kernel(LQ, TW, BL, o_del, e_del, o_ins, e_ins, match, mismatch,
                zdrop, blocked_scan):
    def kern(q_ref, ql_ref, t_ref, tl_ref, h0_ref,
             score_ref, qle_ref, tle_ref, gscore_ref, gtle_ref):
        i16 = jnp.int32
        tt = t_ref[:].astype(jnp.int32)
        ql = ql_ref[:]
        tl = tl_ref[:]
        h0 = h0_ref[:].astype(i16)
        jt32 = jax.lax.broadcasted_iota(jnp.int32, (TW, BL), 0)
        jt = jt32
        tmask = jt32 <= tl
        tvalid = tt < 4                       # hoisted
        neg = jnp.full((TW, BL), NEG16, i16)
        h_row0 = h0 - jnp.int32(o_del) - jnp.int32(e_del) * jt
        h_row0 = jnp.where(h_row0 < 0, neg, h_row0)
        h_row0 = jnp.where(jt32 == 0, h0, h_row0)
        h_row0 = jnp.where(tmask, h_row0, neg)
        ecoef = jnp.int32(e_del) * jt
        oecoef = jnp.int32(o_del) + ecoef     # folded E finish
        mask_ge1 = jt32 >= 1
        if blocked_scan:
            NB = TW // 32
            inblk = jt32 & 31
            masks = [inblk >= s for s in (1, 2, 4, 8, 16)]
            jb = jax.lax.broadcasted_iota(jnp.int32, (NB, BL), 0)
            bmasks = []
            s = 1
            while s < NB:
                bmasks.append(jb >= s)
                s *= 2
            negb = jnp.full((NB, BL), NEG16, i16)
        else:
            n_steps = max(TW - 1, 1).bit_length()
            masks = None

        def row_body(i, qi, st):
            h_prev, f_prev, bscore, brow, g_row, zstate = st
            zbest, zbi, zbj, stopped = zstate
            is_match = (tt == qi) & tvalid & (qi < 4)
            sub = jnp.where(is_match, jnp.int32(match), jnp.int32(-mismatch))
            h_up = pltpu.roll(h_prev, shift=1, axis=0)
            h_up = jnp.where(mask_ge1, h_up, neg)
            M = h_up + sub
            F = jnp.maximum(h_prev - jnp.int32(o_ins + e_ins),
                            f_prev - jnp.int32(e_ins))
            hnd = jnp.where(mask_ge1, jnp.maximum(M, F), F)
            hnd = jnp.maximum(hnd, neg)
            g = hnd + ecoef
            if blocked_scan:
                s = 1
                for m in masks:
                    rolled = pltpu.roll(g, shift=s, axis=0)
                    g = jnp.maximum(g, jnp.where(m, rolled, neg))
                    s *= 2
                bm = g.reshape(NB, 32, BL)[:, 31, :]
                s = 1
                for bmsk in bmasks:
                    rb = pltpu.roll(bm, shift=s, axis=0)
                    bm = jnp.maximum(bm, jnp.where(bmsk, rb, negb))
                    s *= 2
                carry = pltpu.roll(bm, shift=1, axis=0)
                carry = jnp.where(jb >= 1, carry, negb)
                g = jnp.maximum(g, jnp.repeat(carry, 32, axis=0))
            else:
                s = 1
                for _ in range(n_steps):
                    rolled = pltpu.roll(g, shift=s, axis=0)
                    g = jnp.maximum(g, jnp.where(jt32 >= s, rolled, neg))
                    s *= 2
            g1 = pltpu.roll(g, shift=1, axis=0)
            E = jnp.where(mask_ge1, g1, neg) - oecoef
            h = jnp.maximum(hnd, E)
            h = jnp.where(tmask, h, neg)
            act32 = (i < ql) & (stopped == 0)
            h = jnp.where(act32, h, h_prev)
            f = jnp.where(act32, F, f_prev)
            hcl = jnp.where(act32 & (jt32 > 0), jnp.maximum(h, -1),
                            jnp.int32(-1))
            better = hcl > bscore
            bscore = jnp.where(better, hcl, bscore)
            brow = jnp.where(better, i, brow)
            g_row = jnp.where(act32 & (i == ql - 1), h, g_row)
            if zdrop > 0:
                m = jnp.max(hcl, axis=0, keepdims=True)
                mj = jnp.min(jnp.where(hcl == m, jt32, 0x7FFF),
                             axis=0, keepdims=True)
                m32 = m.astype(jnp.int32)
                better_z = m32 > zbest
                di = i - zbi
                dj = mj - zbj
                gap = jnp.abs(di - dj)
                pen = jnp.where(di > dj, e_del, e_ins) * gap
                zstop = act32 & ~better_z & (zbest - m32 - pen > zdrop)
                stopped = jnp.maximum(
                    stopped, (zstop | (act32 & (m32 <= 0))).astype(jnp.int32))
                zbest = jnp.where(act32 & better_z, m32, zbest)
                zbi = jnp.where(act32 & better_z, i, zbi)
                zbj = jnp.where(act32 & better_z, mj, zbj)
            return (h, f, bscore, brow, g_row, (zbest, zbi, zbj, stopped))

        def blk_body(ib, st):
            i0 = ib * 16
            qblk = q_ref[pl.ds(pl.multiple_of(i0, 16), 16), :].astype(jnp.int32)
            for k in range(16):
                st = row_body(i0 + k, qblk[k:k + 1, :], st)
            return st

        zero1 = jnp.zeros((1, BL), jnp.int32)
        zinit = (h0_ref[:].astype(jnp.int32), zero1, zero1,
                 jnp.zeros((1, BL), jnp.int32))
        init = (h_row0, neg, jnp.full((TW, BL), -1, i16),
                jnp.zeros((TW, BL), i16), neg, zinit)
        h, f, bscore, brow, g_row, _ = jax.lax.fori_loop(
            0, LQ // 16, blk_body, init)
        BIG = jnp.int32(0x7FFFFFFF)
        pack = ((bscore.astype(jnp.int32) + 2) << 12) \
            + (4095 - brow.astype(jnp.int32))
        colmax = jnp.max(pack, axis=0, keepdims=True)
        btle = jnp.min(jnp.where(pack == colmax, jt32, BIG), axis=0,
                       keepdims=True)
        score = (colmax >> 12) - 2
        bqle = 4095 - (colmax & 0xFFF) + 1
        found = score > 0
        score_ref[:] = jnp.where(found, score, 0)
        qle_ref[:] = jnp.where(found, bqle, 0)
        tle_ref[:] = jnp.where(found, btle, 0)
        g32 = g_row.astype(jnp.int32)
        gbest = jnp.max(g32, axis=0, keepdims=True)
        gscore_ref[:] = jnp.where(gbest <= NEG16, jnp.int32(-0x40000000),
                                  gbest)
        gtle_ref[:] = jnp.min(jnp.where(g32 == gbest, jt32, BIG), axis=0,
                              keepdims=True)
    return kern


def extend_v3(query, qlen, target, tlen, h0, BL=128, blocked_scan=True,
              o_del=6, e_del=1, o_ins=6, e_ins=1, match=1, mismatch=4,
              zdrop=100):
    B, LQ0 = query.shape
    _, LT = target.shape
    TW = ((LT + 1 + 31) // 32) * 32 if blocked_scan else ((LT + 1 + 7) // 8) * 8
    LQ = ((LQ0 + 15) // 16) * 16
    Bp = ((B + BL - 1) // BL) * BL
    qp = jnp.full((LQ, Bp), 4, jnp.int16).at[:LQ0, :B].set(
        query.astype(jnp.int16).T)
    tp = jnp.full((TW, Bp), 4, jnp.int16).at[1:LT + 1, :B].set(
        target.astype(jnp.int16).T)
    qlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(qlen.astype(jnp.int32))
    tlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(tlen.astype(jnp.int32))
    h0p = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(h0.astype(jnp.int32))
    kern = make_kernel(LQ, TW, BL, o_del, e_del, o_ins, e_ins, match,
                       mismatch, zdrop, blocked_scan)
    grid = (Bp // BL,)
    def bspec(rows):
        return pl.BlockSpec((rows, BL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[bspec(LQ), bspec(1), bspec(TW), bspec(1), bspec(1)],
        out_specs=[bspec(1)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, Bp), jnp.int32)] * 5,
    )(qp, qlp, tp, tlp, h0p)
    score, qle, tle, gscore, gtle = [o[0, :B] for o in out]
    return dict(score=score, qle=qle, tle=tle, gscore=gscore, gtle=gtle)


def make_kernel_v4(LQ, TW, BL, NCH, o_del, e_del, o_ins, e_ins, match,
                mismatch, zdrop):
    # NCH independent chains, each BL lanes; q/t blocks are [*, NCH*BL]
    def kern(q_ref, ql_ref, t_ref, tl_ref, h0_ref,
             score_ref, qle_ref, tle_ref, gscore_ref, gtle_ref):
        i16 = jnp.int32
        jt32 = jax.lax.broadcasted_iota(jnp.int32, (TW, BL), 0)
        n_steps = max(TW - 1, 1).bit_length()
        ecoef = jnp.int32(e_del) * jt32
        oecoef = jnp.int32(o_del) + ecoef
        mask_ge1 = jt32 >= 1
        neg = jnp.full((TW, BL), NEG16, i16)
        chans = []
        for c in range(NCH):
            sl = pl.ds(c * BL, BL)
            tt = t_ref[:, sl].astype(jnp.int32)
            ql = ql_ref[:, sl]; tl = tl_ref[:, sl]
            h0 = h0_ref[:, sl].astype(i16)
            tmask = jt32 <= tl
            tvalid = tt < 4
            h_row0 = h0 - jnp.int32(o_del) - jnp.int32(e_del) * jt32
            h_row0 = jnp.where(h_row0 < 0, neg, h_row0)
            h_row0 = jnp.where(jt32 == 0, h0, h_row0)
            h_row0 = jnp.where(tmask, h_row0, neg)
            zero1 = jnp.zeros((1, BL), jnp.int32)
            st = (h_row0, neg, jnp.full((TW, BL), -1, i16),
                  jnp.zeros((TW, BL), i16), neg,
                  (h0.astype(jnp.int32), zero1, zero1,
                   jnp.zeros((1, BL), jnp.int32)))
            chans.append(dict(tt=tt, ql=ql, tl=tl, tmask=tmask,
                              tvalid=tvalid, st=st))

        def row_step(c, i, qi, st):
            h_prev, f_prev, bscore, brow, g_row, zstate = st
            zbest, zbi, zbj, stopped = zstate
            tt, ql, tmask, tvalid = c["tt"], c["ql"], c["tmask"], c["tvalid"]
            is_match = (tt == qi) & tvalid & (qi < 4)
            sub = jnp.where(is_match, jnp.int32(match), jnp.int32(-mismatch))
            h_up = pltpu.roll(h_prev, shift=1, axis=0)
            h_up = jnp.where(mask_ge1, h_up, neg)
            M = h_up + sub
            F = jnp.maximum(h_prev - jnp.int32(o_ins + e_ins),
                            f_prev - jnp.int32(e_ins))
            hnd = jnp.where(mask_ge1, jnp.maximum(M, F), F)
            hnd = jnp.maximum(hnd, neg)
            g = hnd + ecoef
            s = 1
            for _ in range(n_steps):
                rolled = pltpu.roll(g, shift=s, axis=0)
                g = jnp.maximum(g, jnp.where(jt32 >= s, rolled, neg))
                s *= 2
            g1 = pltpu.roll(g, shift=1, axis=0)
            E = jnp.where(mask_ge1, g1, neg) - oecoef
            h = jnp.maximum(hnd, E)
            h = jnp.where(tmask, h, neg)
            act32 = (i < ql) & (stopped == 0)
            h = jnp.where(act32, h, h_prev)
            f = jnp.where(act32, F, f_prev)
            hcl = jnp.where(act32 & (jt32 > 0), jnp.maximum(h, -1),
                            jnp.int32(-1))
            better = hcl > bscore
            bscore = jnp.where(better, hcl, bscore)
            brow = jnp.where(better, i, brow)
            g_row = jnp.where(act32 & (i == ql - 1), h, g_row)
            m = jnp.max(hcl, axis=0, keepdims=True)
            mj = jnp.min(jnp.where(hcl == m, jt32, 0x7FFF),
                         axis=0, keepdims=True)
            m32 = m.astype(jnp.int32)
            better_z = m32 > zbest
            di = i - zbi; dj = mj - zbj
            gap = jnp.abs(di - dj)
            pen = jnp.where(di > dj, e_del, e_ins) * gap
            zstop = act32 & ~better_z & (zbest - m32 - pen > zdrop)
            stopped = jnp.maximum(stopped,
                                  (zstop | (act32 & (m32 <= 0))).astype(jnp.int32))
            zbest = jnp.where(act32 & better_z, m32, zbest)
            zbi = jnp.where(act32 & better_z, i, zbi)
            zbj = jnp.where(act32 & better_z, mj, zbj)
            return (h, f, bscore, brow, g_row, (zbest, zbi, zbj, stopped))

        def blk_body(ib, sts):
            i0 = ib * 16
            qblks = [q_ref[pl.ds(pl.multiple_of(i0, 16), 16),
                           pl.ds(c * BL, BL)].astype(jnp.int32)
                     for c in range(NCH)]
            for k in range(16):
                sts = tuple(row_step(chans[c], i0 + k,
                                     qblks[c][k:k+1, :], sts[c])
                            for c in range(NCH))
            return sts
        sts = jax.lax.fori_loop(0, LQ // 16, blk_body,
                                tuple(c["st"] for c in chans))
        BIG = jnp.int32(0x7FFFFFFF)
        for c in range(NCH):
            h, f, bscore, brow, g_row, _ = sts[c]
            sl = pl.ds(c * BL, BL)
            pack = ((bscore.astype(jnp.int32) + 2) << 12) \
                + (4095 - brow.astype(jnp.int32))
            colmax = jnp.max(pack, axis=0, keepdims=True)
            btle = jnp.min(jnp.where(pack == colmax, jt32, BIG), axis=0,
                           keepdims=True)
            score = (colmax >> 12) - 2
            bqle = 4095 - (colmax & 0xFFF) + 1
            found = score > 0
            score_ref[:, sl] = jnp.where(found, score, 0)
            qle_ref[:, sl] = jnp.where(found, bqle, 0)
            tle_ref[:, sl] = jnp.where(found, btle, 0)
            g32 = g_row.astype(jnp.int32)
            gbest = jnp.max(g32, axis=0, keepdims=True)
            gscore_ref[:, sl] = jnp.where(gbest <= NEG16,
                                          jnp.int32(-0x40000000), gbest)
            gtle_ref[:, sl] = jnp.min(jnp.where(g32 == gbest, jt32, BIG),
                                      axis=0, keepdims=True)
    return kern


def extend_v4(query, qlen, target, tlen, h0, NCH=2,
              o_del=6, e_del=1, o_ins=6, e_ins=1, match=1, mismatch=4,
              zdrop=100):
    BL = 128
    W = NCH * BL
    B, LQ0 = query.shape
    _, LT = target.shape
    TW = ((LT + 1 + 7) // 8) * 8
    LQ = ((LQ0 + 15) // 16) * 16
    Bp = ((B + W - 1) // W) * W
    qp = jnp.full((LQ, Bp), 4, jnp.int16).at[:LQ0, :B].set(
        query.astype(jnp.int16).T)
    tp = jnp.full((TW, Bp), 4, jnp.int16).at[1:LT + 1, :B].set(
        target.astype(jnp.int16).T)
    qlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(qlen.astype(jnp.int32))
    tlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(tlen.astype(jnp.int32))
    h0p = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(h0.astype(jnp.int32))
    kern = make_kernel_v4(LQ, TW, BL, NCH, o_del, e_del, o_ins, e_ins,
                       match, mismatch, zdrop)
    grid = (Bp // W,)
    def bspec(rows):
        return pl.BlockSpec((rows, W), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[bspec(LQ), bspec(1), bspec(TW), bspec(1), bspec(1)],
        out_specs=[bspec(1)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, Bp), jnp.int32)] * 5,
    )(qp, qlp, tp, tlp, h0p)
    score, qle, tle, gscore, gtle = [o[0, :B] for o in out]
    return dict(score=score, qle=qle, tle=tle, gscore=gscore, gtle=gtle)




if __name__ == "__main__":
    from seqlib_tpu.ops.sw_pallas import extend_batch_pallas
    from seqlib_tpu.ops.sw import extend_batch
    np.asarray(jnp.ones(8)+1)
    rng = np.random.default_rng(0)
    Bs, Lq, Lt = 1024, 150, 250
    q = jnp.asarray(rng.integers(0, 5, (Bs, Lq)).astype(np.int8))
    t = jnp.asarray(rng.integers(0, 5, (Bs, Lt)).astype(np.int8))
    ql = jnp.asarray(rng.integers(100, Lq + 1, Bs).astype(np.int32))
    tl = jnp.asarray(rng.integers(150, Lt + 1, Bs).astype(np.int32))
    h0 = jnp.asarray(rng.integers(10, 151, Bs).astype(np.int32))
    ref = {k: np.asarray(v) for k, v in
           extend_batch(q, ql, t, tl, h0, zdrop=100).items()}
    import functools as ft
    K = 32
    def rate(fn, label):
        got = {k: np.asarray(v) for k, v in fn(q, ql, t, tl, h0).items()}
        for k in ref:
            assert np.array_equal(got[k], ref[k]), (label, k,
                np.flatnonzero(got[k] != ref[k])[:5],
                got[k][np.flatnonzero(got[k] != ref[k])[:5]],
                ref[k][np.flatnonzero(got[k] != ref[k])[:5]])
        @jax.jit
        def chained(q, ql, t, tl, h0):
            def body(_, h):
                return fn(q, ql, t, tl, h)["score"] % 1000
            return jnp.sum(jax.lax.fori_loop(0, K, body, h0))
        int(chained(q, ql, t, tl, h0))
        best = 0
        for _ in range(3):
            t0 = time.time()
            int(chained(q, ql, t, tl, h0))
            best = max(best, Bs * Lq * Lt * K / (time.time() - t0) / 1e9)
        print(f"{label}: {best:.1f} Gcells/s (exact)", flush=True)
    def safe(fn, label):
        try:
            rate(fn, label)
        except AssertionError as e:
            print(f"{label}: MISMATCH {str(e)[:200]}", flush=True)
        except Exception as e:
            print(f"{label}: ERROR {str(e)[:150]}", flush=True)
    safe(lambda *a: extend_batch_pallas(*a, zdrop=100), "v2 production")
    for BL in (128, 256):
        for bs in (False, True):
            safe(ft.partial(extend_v3, BL=BL, blocked_scan=bs),
                 f"v3 BL={BL} blocked={bs}")
    for nch in (2, 3):
        safe(ft.partial(extend_v4, NCH=nch), f"v4 interleaved NCH={nch}")
