"""Pallas TPU kernel for the SMEM seed machine (round-1/2 promise,
VERDICT r2 task 3).

Why: the pure-XLA `_smem_machine` (ops/fm.py) is KERNEL-LAUNCH bound —
its while body compiles to ~45 small fusions, each costing ~35 us of
fixed dispatch on this chip, so one machine step costs ~0.9 ms
regardless of batch width (measured; see docs/SEED_MACHINE.md).  This
module keeps the while_loop and the HBM block-row gather in XLA (the
only op Mosaic cannot express for an arbitrarily large FM-index) and
fuses EVERYTHING else — the FMD rank algebra with its 64
popcount/mask reductions, the 4-state machine, the circular stack,
and the emission writes — into ONE `pallas_call` per step:

    per step:  1 XLA gather  (block rows for both rank positions)
             + 1 Pallas kernel (whole machine step)

vs ~22 kernels/step before.  Semantics are IDENTICAL to
`_smem_machine` — pinned by tests/test_smem.py's brute-force oracle
(CPU, XLA path) and tests/test_fm_pallas.py's TPU cross-check of the
two implementations.

Data layout: lanes live in the last two dims [R, 128] (R = B/128);
per-lane small axes (stack C, seed slots S, packed read words Lp) are
LEADING dims, so every op is an (8,128)-tiled VPU op.  Read bases are
packed 8 per int32 (4 bits each) so the per-step character fetch is a
one-hot reduce over Lp = ceil(L/8) words + a vector shift — no
gather.  Reference semantics: bwa bwt_smem1 / mem_collect_intv
(consumed at /root/reference/src/BWAAligner.cpp:104-109).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_M_INIT, _M_FWD, _M_BWD, _M_DONE = 0, 1, 2, 3

# state rows of the stacked [NS, R, 128] tensor
(S_MODE, S_X, S_NX, S_I, S_K, S_L, S_S, S_END, S_SN, S_BJ, S_BK, S_BL,
 S_BS, S_BE, S_LASTI, S_ROUNDS, S_N, S_NFULL) = range(18)
_NS = 18
_MASK55 = 0x55555555  # python int: jnp constants would be captured tracers


def _int32c(v: int):
    """Python int -> int32 two's-complement constant (avoids uint
    overflow when building 0xFFFFFFFF-style patterns)."""
    return v - (1 << 32) if v >= (1 << 31) else v


def _popcount_prefix(words, pat, within):
    """# of 2-bit code matching ``pat`` among the first ``within``
    bases of one 128-base block.  words: list of 8 [R,128] int32;
    within [R,128] in [0, 128]."""
    cnt = jnp.zeros_like(within)
    for w in range(8):
        x = words[w] ^ pat
        nx = ~x
        m = nx & ((nx >> 1) & 0x7FFFFFFF) & _MASK55
        t = jnp.clip(within - 16 * w, 0, 16)
        sh = jnp.clip(32 - 2 * t, 0, 31)
        mask = jnp.where(t > 0, (-1) << sh, 0).astype(jnp.int32)
        cnt = cnt + jax.lax.population_count(m & mask)
    return cnt


def _sel4(a4, c):
    """a4[c] for per-lane c in 0..3 (arithmetic select)."""
    return jnp.where(c < 2, jnp.where(c == 0, a4[0], a4[1]),
                     jnp.where(c == 2, a4[2], a4[3]))


def _step_kernel(scal_ref, rows_ref, readsp_ref, lens_ref, minintv_ref,
                 st_ref, stk_ref, em_ref,
                 st_out, stk_out, em_out, gidx_out,
                 *, L: int, Lp: int, C: int, S: int,
                 min_seed_len: int, max_rounds: int):
    primary = scal_ref[0, 0]
    L2 = [scal_ref[0, 1 + c] for c in range(5)]
    lens = lens_ref[...]
    min_intv = minintv_ref[...]

    st = [st_ref[j] for j in range(_NS)]
    mode = st[S_MODE]
    is_fwd = mode == _M_FWD
    is_bwd = mode == _M_BWD
    ip = st[S_I]

    def fetch_char(pos, valid):
        """read base at pos (0..L-1) via one-hot word reduce + nibble
        shift; 4 where invalid."""
        pc = jnp.clip(pos, 0, L - 1)
        row = pc >> 3
        acc = jnp.zeros_like(pos)
        for r in range(Lp):
            acc = acc + jnp.where(row == r, readsp_ref[r], 0)
        ch = (acc >> ((pc & 7) * 4)) & 0xF
        return jnp.where(valid, ch, 4)

    ch = fetch_char(ip, (is_fwd & (ip < lens)) | (is_bwd & (ip >= 0)))
    ch_ok = ch < 4

    # ---- FMD bi-extension from the pre-gathered block rows ---------
    Ain = jnp.where(is_fwd, st[S_L], st[S_BK])
    Bin = jnp.where(is_fwd, st[S_K], st[S_BL])
    Sin = jnp.where(is_fwd, st[S_S], st[S_BS])
    tk = []
    for p, v in ((0, Ain), (1, Ain + Sin)):
        vp = v - (v > primary).astype(jnp.int32)
        within = vp & 127
        base = [rows_ref[c, p] for c in range(4)]
        words = [rows_ref[4 + w, p] for w in range(8)]
        tk.append([base[c] + _popcount_prefix(
            words, _int32c(c * _MASK55), within) for c in range(4)])
    s4 = [tk[1][c] - tk[0][c] for c in range(4)]
    k4 = [L2[c] + 1 + tk[0][c] for c in range(4)]
    has_sent = ((Ain <= primary) & (primary < Ain + Sin)).astype(jnp.int32)
    l3 = Bin + has_sent
    l2 = l3 + s4[3]
    l1 = l2 + s4[2]
    l0 = l1 + s4[1]
    l4 = [l0, l1, l2, l3]
    cc = jnp.where(is_fwd, jnp.clip(3 - ch, 0, 3), jnp.minimum(ch, 3))
    nk = jnp.where(is_fwd, _sel4(l4, cc), _sel4(k4, cc))
    nl = jnp.where(is_fwd, _sel4(k4, cc), _sel4(l4, cc))
    ns = _sel4(s4, cc)

    # ---- FWD lanes -------------------------------------------------
    f_ok = is_fwd & ch_ok
    changed = f_ok & (ns != st[S_S])
    die = changed & (ns < min_intv)
    hit_end = is_fwd & ~ch_ok
    push = changed | hit_end
    cidx = jax.lax.broadcasted_iota(jnp.int32, stk_ref.shape[1:], 0)
    hot_p = push[None] & (cidx == (st[S_SN] & (C - 1))[None])
    sk = jnp.where(hot_p, st[S_K][None], stk_ref[0])
    sl = jnp.where(hot_p, st[S_L][None], stk_ref[1])
    ss = jnp.where(hot_p, st[S_S][None], stk_ref[2])
    se = jnp.where(hot_p, st[S_END][None], stk_ref[3])
    sn = st[S_SN] + push.astype(jnp.int32)
    adv = f_ok & ~die
    k = jnp.where(adv, nk, st[S_K])
    l = jnp.where(adv, nl, st[S_L])
    s = jnp.where(adv, ns, st[S_S])
    end = jnp.where(adv, ip + 1, st[S_END])
    fwd_dead = die | hit_end
    nx = jnp.where(fwd_dead, end, st[S_NX])

    # ---- BWD lanes -------------------------------------------------
    b_die = is_bwd & (~ch_ok | (ns < min_intv))
    b_adv = is_bwd & ~b_die
    e_start = ip + 1
    want = b_die & (st[S_BE] - e_start >= min_seed_len) \
        & (e_start < st[S_LASTI] + 1)
    emit = want & (st[S_N] < S)
    sidx = jax.lax.broadcasted_iota(jnp.int32, em_ref.shape[1:], 0)
    hot_e = emit[None] & (sidx == st[S_N][None])
    qspan = jnp.where(hot_e, ((e_start << 16) | st[S_BE])[None],
                      em_ref[0])
    intv_l = jnp.where(hot_e, st[S_BK][None], em_ref[1])
    intv_sz = jnp.where(hot_e, st[S_BS][None], em_ref[2])
    n = st[S_N] + emit.astype(jnp.int32)
    nfull = st[S_NFULL] + (want & ~emit).astype(jnp.int32)
    last_i = jnp.where(emit, ip, st[S_LASTI])

    bj1 = st[S_BJ] - 1
    bwd_done = b_die & ((bj1 < 0) | (bj1 < sn - C))
    to_entry = b_die & ~bwd_done
    rounds = st[S_ROUNDS] + bwd_done.astype(jnp.int32)

    x = jnp.where(bwd_done, nx, st[S_X])
    i = jnp.where(is_fwd | to_entry,
                  jnp.where(f_ok & ~fwd_dead, ip + 1, st[S_X] - 1),
                  jnp.where(b_adv, ip - 1, ip))
    bj = jnp.where(fwd_dead, sn - 1, jnp.where(b_die, bj1, st[S_BJ]))
    need_load = fwd_dead | to_entry
    hot_l = need_load[None] & (cidx == (jnp.maximum(bj, 0) & (C - 1))[None])
    bk = jnp.where(need_load, jnp.sum(jnp.where(hot_l, sk, 0), axis=0),
                   jnp.where(b_adv, nk, st[S_BK]))
    bl = jnp.where(need_load, jnp.sum(jnp.where(hot_l, sl, 0), axis=0),
                   jnp.where(b_adv, nl, st[S_BL]))
    bs = jnp.where(need_load, jnp.sum(jnp.where(hot_l, ss, 0), axis=0),
                   jnp.where(b_adv, ns, st[S_BS]))
    be = jnp.where(need_load, jnp.sum(jnp.where(hot_l, se, 0), axis=0),
                   st[S_BE])
    last_i = jnp.where(fwd_dead, 2**30, last_i)
    mode = jnp.where(fwd_dead, _M_BWD,
                     jnp.where(bwd_done,
                               jnp.where(rounds >= max_rounds,
                                         _M_DONE, _M_INIT), mode))

    # ---- INIT fold-in ---------------------------------------------
    is_init = mode == _M_INIT
    past = x >= lens
    c0 = fetch_char(x, is_init & ~past)
    c0c = jnp.minimum(c0, 3)
    s0 = _sel4([L2[1] - L2[0], L2[2] - L2[1], L2[3] - L2[2],
                L2[4] - L2[3]], c0c)
    ok0 = is_init & ~past & (c0 < 4) & (s0 >= min_intv) & (s0 > 0)
    skip = is_init & ~past & ~ok0
    x = jnp.where(skip, x + 1, x)
    rounds = rounds + skip.astype(jnp.int32)
    mode = jnp.where(is_init & past, _M_DONE,
                     jnp.where(ok0, _M_FWD,
                               jnp.where(skip & (rounds >= max_rounds),
                                         _M_DONE, mode)))
    k = jnp.where(ok0, _sel4(L2, c0c) + 1, k)
    l = jnp.where(ok0, _sel4([L2[3], L2[2], L2[1], L2[0]], c0c) + 1, l)
    s = jnp.where(ok0, s0, s)
    end = jnp.where(ok0, x + 1, end)
    i = jnp.where(ok0, x + 1, i)
    sn = jnp.where(ok0, 0, sn)

    # ---- next-step gather indices ---------------------------------
    nmode = mode
    A_next = jnp.where(nmode == _M_FWD, l,
                       jnp.where(nmode == _M_BWD, bk, 0))
    S_next = jnp.where(nmode == _M_FWD, s,
                       jnp.where(nmode == _M_BWD, bs, 0))
    p0 = A_next - (A_next > primary).astype(jnp.int32)
    p1 = (A_next + S_next) - ((A_next + S_next) > primary).astype(jnp.int32)
    gidx_out[...] = jnp.stack(
        [jnp.maximum(p0, 0) >> 7, jnp.maximum(p1, 0) >> 7], axis=0)

    st_out[...] = jnp.stack(
        [mode, x, nx, i, k, l, s, end, sn, bj, bk, bl, bs, be,
         last_i, rounds, n, nfull], axis=0)
    stk_out[...] = jnp.stack([sk, sl, ss, se], axis=0)
    em_out[...] = jnp.stack([qspan, intv_l, intv_sz], axis=0)


def _pack_reads(reads, L, Lp, R):
    """[B, L] nt4 codes -> [Lp, R, 128] int32, 8 bases per word,
    4 bits each (base j of word w = bits 4j..4j+3 of position 8w+j)."""
    B = reads.shape[0]
    r = reads.astype(jnp.int32)
    pad = Lp * 8 - L
    if pad:
        r = jnp.concatenate(
            [r, jnp.full((B, pad), 4, jnp.int32)], axis=1)
    r = r.reshape(B, Lp, 8)
    sh = jnp.arange(8, dtype=jnp.int32)[None, None, :] * 4
    packed = jnp.sum(r << sh, axis=2)                      # [B, Lp]
    return packed.T.reshape(Lp, R, 128)


def smem_machine_pallas(fm, reads, lens, x0, min_intv, active,
                        max_seeds: int, min_seed_len: int, C: int,
                        max_rounds: int, step_cap: int,
                        interpret: bool = False):
    """Drop-in replacement for ops.fm._smem_machine on TPU backends.
    Same contract: returns dict(qbeg, qend, intv_l, intv_sz
    [B, max_seeds], n_seeds, n_dropped [B]).

    ``interpret=True`` runs the kernel through the Pallas interpreter
    (no Mosaic), so the bit-identity cross-check against the XLA
    machine also runs on the CPU mesh (tests/test_fm_pallas.py — this
    was the suite's only hardware-gated skip, VERDICT r3 item 9)."""
    B, L = reads.shape
    assert C & (C - 1) == 0, "stack capacity must be a power of two"
    R = -(-B // 128)
    Bp = R * 128
    S = max_seeds
    Lp = -(-L // 8)
    if Bp != B:
        padB = Bp - B
        reads = jnp.concatenate(
            [reads, jnp.full((padB, L), 4, reads.dtype)], axis=0)
        lens = jnp.concatenate([lens, jnp.zeros(padB, lens.dtype)])
        x0 = jnp.concatenate([x0, jnp.zeros(padB, x0.dtype)])
        min_intv = jnp.concatenate(
            [min_intv, jnp.ones(padB, min_intv.dtype)])
        active = jnp.concatenate([active, jnp.zeros(padB, bool)])

    def g2(v):
        return v.astype(jnp.int32).reshape(R, 128)

    readsp = _pack_reads(reads, L, Lp, R)
    lens2 = g2(lens)
    minintv2 = g2(min_intv)
    scal = jnp.concatenate(
        [fm.primary.reshape(1), fm.L2.astype(jnp.int32),
         jnp.zeros(2, jnp.int32)]).reshape(1, 8)
    blocksT = jax.lax.bitcast_convert_type(
        fm.blocks, jnp.int32).T                             # [12, nb+1]

    mode0 = jnp.where(g2(jnp.asarray(active)) != 0,
                      jnp.int32(_M_INIT), jnp.int32(_M_DONE))
    mode0 = jnp.where(g2(x0) < lens2, mode0, jnp.int32(_M_DONE))
    z = jnp.zeros((R, 128), jnp.int32)
    st = jnp.stack([mode0, g2(x0)] + [z] * (_NS - 2), axis=0)
    stk = jnp.zeros((4, C, R, 128), jnp.int32)
    em = jnp.zeros((3, S, R, 128), jnp.int32)
    gidx = jnp.zeros((2, R, 128), jnp.int32)

    kern = functools.partial(
        _step_kernel, L=L, Lp=Lp, C=C, S=S,
        min_seed_len=min_seed_len, max_rounds=max_rounds)
    step = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((_NS, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((4, C, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((3, S, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((2, R, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )

    def cond(carry):
        st, stk, em, gidx, it = carry
        return jnp.any(st[S_MODE] != _M_DONE) & (it < step_cap)

    def body(carry):
        st, stk, em, gidx, it = carry
        rows = blocksT[:, gidx]                 # [12, 2, R, 128]
        st, stk, em, gidx = step(scal, rows, readsp, lens2, minintv2,
                                 st, stk, em)
        return (st, stk, em, gidx, it + 1)

    st, stk, em, gidx, _ = jax.lax.while_loop(
        cond, body, (st, stk, em, gidx, jnp.int32(0)))
    truncated = (st[S_MODE] != _M_DONE).astype(jnp.int32)

    def back1(v):
        return v.reshape(Bp)[:B]

    def back2(v):                               # [S, R, 128] -> [B, S]
        return v.reshape(v.shape[0], Bp).T[:B]

    qspan = back2(em[0])
    return dict(qbeg=qspan >> 16, qend=qspan & 0xFFFF,
                intv_l=back2(em[1]), intv_sz=back2(em[2]),
                n_seeds=back1(st[S_N]),
                n_dropped=back1(st[S_NFULL] + truncated))
