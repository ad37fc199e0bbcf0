"""Pallas TPU kernel for the affine-gap extension DP.

Same contract as ops.sw.extend_batch, but the whole row loop runs
inside one Mosaic kernel with DP state resident in VMEM:

* grid over batch tiles (BT pairs per program, target axis in lanes),
* per-row work is elementwise VPU math + a log2(TW) shift-max scan
  (pltpu.roll) for the same-row E dependency,
* packed (score, row) running maxima; cross-lane argmax reductions
  happen once at the end.

Status (v5e measurements, chained-iteration on-device timing):
XLA extend_batch sustains 17 Gcells/s; this kernel reaches 12.5 at
BT=64 (2.2 at BT=8) — the per-row masked column select and the
roll-based scan don't yet beat XLA's fused loop body, so production
uses the XLA path and this kernel remains the substrate for further
Mosaic tuning (int16 state, transposed query loads, two-row
unrolling).  Bit-exact vs extend_batch on TPU and in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw import NEG, _PACK_BIAS, _PACK_SHIFT

BT = 64  # batch tile (sublanes per program)


def _shift_right_max(g: jax.Array, TW1: int) -> jax.Array:
    """Running max over j' <= j (inclusive scan) via log-step shifts."""
    col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    s = 1
    while s < TW1:
        rolled = pltpu.roll(g, shift=s, axis=1)
        rolled = jnp.where(col >= s, rolled, NEG)
        g = jnp.maximum(g, rolled)
        s *= 2
    return g


def _extend_kernel(q_ref, ql_ref, t_ref, tl_ref, h0_ref,
                   score_ref, qle_ref, tle_ref, gscore_ref, gtle_ref,
                   *, LQ: int, TW1: int, o_del: int, e_del: int,
                   o_ins: int, e_ins: int, match: int, mismatch: int):
    q = q_ref[:].astype(jnp.int32)            # [BT, LQ]
    q_col = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    tt = t_ref[:].astype(jnp.int32)           # [BT, TW1-1]
    ql = ql_ref[:].astype(jnp.int32)          # [BT, 1]
    tl = tl_ref[:].astype(jnp.int32)
    h0 = h0_ref[:].astype(jnp.int32)

    bt = q_ref.shape[0]
    jt = jax.lax.broadcasted_iota(jnp.int32, (bt, TW1), 1)
    tmask = jt <= tl
    h_row0 = h0 - jnp.where(jt > 0, o_del + e_del * jt, 0)
    h_row0 = jnp.where((h_row0 < 0) & (jt > 0), NEG, h_row0)
    h_row0 = jnp.where(tmask, h_row0, NEG)

    ecoef = e_del * jt

    def body(i, st):
        h_prev, f_prev, best_pack, g_row = st
        # select query column i (Mosaic lane slices must be 128-aligned,
        # so use a masked reduction instead of a dynamic slice)
        qi = jnp.max(jnp.where(q_col == i, q, 0), axis=1,
                     keepdims=True)                           # [BT, 1]
        is_match = (tt == qi) & (tt < 4) & (qi < 4)
        sub = jnp.where(is_match, match, -mismatch)           # [BT, TW1-1]
        M = h_prev[:, :-1] + sub
        F = jnp.maximum(h_prev - (o_ins + e_ins), f_prev - e_ins)
        hnd = jnp.concatenate(
            [jnp.maximum(F[:, :1], NEG), jnp.maximum(M, F[:, 1:])],
            axis=1)
        # E(j) = max_{j'<j}(hnd(j') + e*j') - o - e*j
        g = _shift_right_max(hnd + ecoef, TW1)
        g_shift = pltpu.roll(g, shift=1, axis=1)
        g_shift = jnp.where(jt >= 1, g_shift, NEG)
        E = g_shift - o_del - ecoef
        h = jnp.maximum(hnd, E)
        h = jnp.where(tmask, h, NEG)
        active = i < ql                                       # [BT, 1]
        h = jnp.where(active, h, h_prev)
        f = jnp.where(active, F, f_prev)
        hp = jnp.where(active & (jt > 0), jnp.maximum(h, -1), -1)
        pack = (hp + _PACK_BIAS) * (1 << _PACK_SHIFT) + (4095 - i)
        best_pack = jnp.maximum(best_pack, pack)
        g_row = jnp.where((i == ql - 1), h, g_row)
        return (h, f, best_pack, g_row)

    neg = jnp.full((bt, TW1), NEG, jnp.int32)
    h, f, best_pack, g_row = jax.lax.fori_loop(
        0, LQ, body, (h_row0, neg, neg, neg))

    BIG = jnp.int32(0x7FFFFFFF)
    col_best = jnp.max(best_pack, axis=1, keepdims=True)
    # first column holding the max (Mosaic has no int argmax)
    btle = jnp.min(jnp.where(best_pack == col_best, jt, BIG), axis=1,
                   keepdims=True)
    score = col_best // (1 << _PACK_SHIFT) - _PACK_BIAS
    bqle = 4095 - (col_best % (1 << _PACK_SHIFT)) + 1
    found = score > 0
    score_ref[:] = jnp.where(found, score, 0)
    qle_ref[:] = jnp.where(found, bqle, 0)
    tle_ref[:] = jnp.where(found, btle, 0)
    gbest = jnp.max(g_row, axis=1, keepdims=True)
    gscore_ref[:] = gbest
    gtle_ref[:] = jnp.min(jnp.where(g_row == gbest, jt, BIG), axis=1,
                          keepdims=True)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match", "mismatch",
                                             "interpret"))
def extend_batch_pallas(query, qlen, target, tlen, h0,
                        o_del: int = 6, e_del: int = 1,
                        o_ins: int = 6, e_ins: int = 1,
                        match: int = 1, mismatch: int = 4,
                        interpret: bool = False):
    """Pallas drop-in for ops.sw.extend_batch (same outputs)."""
    B, LQ = query.shape
    _, LT = target.shape
    TW1 = ((LT + 1 + 127) // 128) * 128
    Bp = ((B + BT - 1) // BT) * BT
    qp = jnp.zeros((Bp, LQ), jnp.int32).at[:B].set(
        query.astype(jnp.int32))
    tp = jnp.full((Bp, TW1 - 1), 4, jnp.int32).at[:B, :LT].set(
        target.astype(jnp.int32))
    qlp = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(
        qlen.astype(jnp.int32))
    tlp = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(
        tlen.astype(jnp.int32))
    h0p = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(
        h0.astype(jnp.int32))

    kern = functools.partial(
        _extend_kernel, LQ=LQ, TW1=TW1, o_del=o_del, e_del=e_del,
        o_ins=o_ins, e_ins=e_ins, match=match, mismatch=mismatch)
    grid = (Bp // BT,)
    bspec = lambda w: pl.BlockSpec((BT, w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec(LQ), bspec(1), bspec(TW1 - 1), bspec(1), bspec(1)],
        out_specs=[bspec(1)] * 5,
        out_shape=[jax.ShapeDtypeStruct((Bp, 1), jnp.int32)] * 5,
        interpret=interpret,
    )(qp, qlp, tp, tlp, h0p)
    score, qle, tle, gscore, gtle = [o[:B, 0] for o in out]
    return dict(score=score, qle=qle, tle=tle, gscore=gscore, gtle=gtle)
