"""Wide device FM ops: the SMEM seed machine + SA walk over (hi, lo)
"int34" ranks — the single-shard path for references whose 2L text
exceeds 2^31 (hg38-scale; docs/SHARDED_INDEX.md milestone 3).

Control flow is the TWIN of ``ops.fm._smem_machine`` (same per-lane
INIT|FWD|BWD|DONE rounds, same circular stack, same emission rules —
see that docstring for the bwa ``bwt_smem1``/``mem_collect_intv``
derivation and the measured carry-packing rationale).  Every
rank-valued carry rides as TWO int32 rows (hi, lo with lo in
[0, 2^30)) using the algebra of :mod:`seqlib_tpu.ops.fm_hilo`, which
is pinned beyond 2^31 by tests/test_fm_hilo.py; the machine itself is
pinned by tests/test_fm_wide.py — bit-parity vs the int32 machine on
every small-index corpus plus the brute-force SMEM oracle.

Reference capability being replaced: libbwa's bwt_t carries 64-bit
ranks natively, so one ``bwaidx_t`` holds any-size genomes
(/root/reference/src/BWAIndex.cpp:28-33); this is the TPU equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fm import _take4, _unroll
from .fm_hilo import (LO_BITS, DeviceFMIndexHiLo, bi_extend_back_hilo,
                      hl_add_small, hl_lt, hl_shift_right, hl_sub,
                      rank_full_hilo)

_M_INIT, _M_FWD, _M_BWD, _M_DONE = 0, 1, 2, 3
_I32_MAX = (1 << 31) - 1


def _sz32(hi, lo):
    """Clamp an (hi, lo) interval size to int32 (downstream compares
    it only against small caps: max_occ<=500, k_occ, split_width)."""
    return jnp.where(hi >= 2, jnp.int32(_I32_MAX),
                     hi * (1 << LO_BITS) + lo)


def smem_machine_wide(fm: DeviceFMIndexHiLo, reads, lens, x0, min_intv,
                      active, max_seeds: int, min_seed_len: int, C: int,
                      max_rounds: int, step_cap: int,
                      p3_seeds: int = 0, p3_max_intv: int = 20):
    """Hi/lo twin of ``ops.fm._smem_machine`` (see module docstring).

    min_intv [B] int32 (1 or occ+1 — always small).  Returns
    dict(qbeg, qend [B, S], il_hi, il_lo [B, S], intv_sz [B, S]
    clamped int32, n_seeds, n_dropped [B]); with p3_seeds > 0 also
    p3_qbeg/p3_qend/p3_il_hi/p3_il_lo/p3_intv_sz [B, P] and p3_n.
    """
    B, L = reads.shape
    bidx = jnp.arange(B)
    cidx = jnp.arange(C, dtype=jnp.int32)[None, :]
    sidx = jnp.arange(max_seeds, dtype=jnp.int32)[None, :]
    L2h, L2l = fm.L2_hi, fm.L2_lo
    z_b = jnp.zeros(B, jnp.int32)
    z_bc = jnp.zeros((B, C), jnp.int32)

    def l2_at(c):                       # L2[c] as a pair
        return L2h[c].astype(jnp.int32), L2l[c].astype(jnp.int32)

    def l2_diff(c):                     # L2[c+1] - L2[c]
        return hl_sub(L2h[c + 1], L2l[c + 1], L2h[c], L2l[c])

    st = dict(
        mode=jnp.where(active & (x0 < lens), _M_INIT,
                       _M_DONE).astype(jnp.int32),
        x=x0.astype(jnp.int32), nx=z_b, i=z_b,
        kh=z_b, kl=z_b, lh=z_b, ll=z_b, sh=z_b, sl=z_b, end=z_b,
        skh=z_bc, skl=z_bc, slh=z_bc, sll=z_bc,   # circular stack
        ssh=z_bc, ssl=z_bc, se=z_bc,
        sn=z_b,
        bj=z_b,
        bkh=z_b, bkl=z_b, blh=z_b, bll=z_b, bsh=z_b, bsl=z_b, be=z_b,
        last_i=z_b,
        rounds=z_b,
        qspan=jnp.zeros((B, max_seeds), jnp.int32),
        il_hi=jnp.zeros((B, max_seeds), jnp.int32),
        il_lo=jnp.zeros((B, max_seeds), jnp.int32),
        isz=jnp.zeros((B, max_seeds), jnp.int32),
        n=z_b, nfull=z_b, it=jnp.int32(0),
    )
    if p3_seeds:
        st.update(
            px=z_b, pi=z_b,
            pkh=z_b, pkl=z_b, plh=z_b, pll=z_b, psh=z_b, psl=z_b,
            pneed=jnp.ones(B, jnp.bool_),
            pdone=lens.astype(jnp.int32) <= 0,
            p_qspan=jnp.zeros((B, p3_seeds), jnp.int32),
            p_ilh=jnp.zeros((B, p3_seeds), jnp.int32),
            p_ill=jnp.zeros((B, p3_seeds), jnp.int32),
            p_isz=jnp.zeros((B, p3_seeds), jnp.int32),
            pn=z_b, pnfull=z_b)
        pidx = jnp.arange(p3_seeds, dtype=jnp.int32)[None, :]

    def body(st):
        mode = st["mode"]
        is_fwd = mode == _M_FWD
        is_bwd = mode == _M_BWD
        ip = st["i"]

        # ---- strategy-pass (p3) INIT fold-in ------------------------
        if p3_seeds:
            p_init = st["pneed"] & ~st["pdone"]
            px = st["px"]
            pc0 = jnp.where(p_init, reads[bidx, jnp.clip(px, 0, L - 1)],
                            4).astype(jnp.int32)
            pc0c = jnp.minimum(pc0, 3)
            p_ok0 = p_init & (pc0 < 4)
            p_skip0 = p_init & ~p_ok0
            c_h, c_l = l2_at(pc0c)
            rc_h, rc_l = l2_at(3 - pc0c)
            d_h, d_l = l2_diff(pc0c)
            pkh_, pkl_ = hl_add_small(c_h, c_l, 1)
            plh_, pll_ = hl_add_small(rc_h, rc_l, 1)
            pkh = jnp.where(p_ok0, pkh_, st["pkh"])
            pkl = jnp.where(p_ok0, pkl_, st["pkl"])
            plh = jnp.where(p_ok0, plh_, st["plh"])
            pll = jnp.where(p_ok0, pll_, st["pll"])
            psh = jnp.where(p_ok0, d_h, st["psh"])
            psl = jnp.where(p_ok0, d_l, st["psl"])
            pi = jnp.where(p_ok0, px + 1, st["pi"])
            px = jnp.where(p_skip0, px + 1, px)
            pneed = st["pneed"] & ~p_ok0
            p_ext = ~pneed & ~st["pdone"]
        if p3_seeds:
            idx2 = jnp.stack([jnp.clip(ip, 0, L - 1),
                              jnp.clip(pi, 0, L - 1)], axis=0)
            ch2 = reads[jnp.broadcast_to(bidx, (2, B)),
                        idx2].astype(jnp.int32)
            ch_raw = ch2[0]
        else:
            ch_raw = reads[bidx, jnp.clip(ip, 0, L - 1)].astype(jnp.int32)
        ch = jnp.where((is_fwd & (ip < lens)) | (is_bwd & (ip >= 0)),
                       ch_raw, 4)
        ch_ok = ch < 4

        # ONE [B] (or [2, B] with p3) FMD extension for both phases
        Ah = jnp.where(is_fwd, st["lh"], st["bkh"])
        Al = jnp.where(is_fwd, st["ll"], st["bkl"])
        Bh = jnp.where(is_fwd, st["kh"], st["blh"])
        Bl = jnp.where(is_fwd, st["kl"], st["bll"])
        Sh = jnp.where(is_fwd, st["sh"], st["bsh"])
        Sl = jnp.where(is_fwd, st["sl"], st["bsl"])
        if p3_seeds:
            # the strategy scan's forward extension rides the same
            # call as a second row (mirrored operands, like fwd lanes)
            A2h = jnp.stack([Ah, plh], axis=0)
            A2l = jnp.stack([Al, pll], axis=0)
            B2h = jnp.stack([Bh, pkh], axis=0)
            B2l = jnp.stack([Bl, pkl], axis=0)
            S2h = jnp.stack([Sh, psh], axis=0)
            S2l = jnp.stack([Sl, psl], axis=0)
            (K4h, K4l), (L4h, L4l), (S4h, S4l) = bi_extend_back_hilo(
                fm, A2h, A2l, B2h, B2l, S2h, S2l)       # [2, B, 4]
            K4h_, K4l_, L4h_, L4l_, S4h_, S4l_ = \
                K4h[0], K4l[0], L4h[0], L4l[0], S4h[0], S4l[0]
        else:
            (K4h_, K4l_), (L4h_, L4l_), (S4h_, S4l_) = \
                bi_extend_back_hilo(fm, Ah, Al, Bh, Bl, Sh, Sl)

        # ---- strategy-pass step (bwt_seed_strategy1) ----------------
        if p3_seeds:
            pch = jnp.where(p_ext & (pi < lens), ch2[1], 4)
            pch_ok = pch < 4
            pcc = jnp.clip(3 - pch, 0, 3)
            pnkh = _take4(L4h[1], pcc)
            pnkl = _take4(L4l[1], pcc)
            pnlh = _take4(K4h[1], pcc)
            pnll = _take4(K4l[1], pcc)
            pnsh = _take4(S4h[1], pcc)
            pnsl = _take4(S4l[1], pcc)
            # size < p3_max_intv (small):  hi==0 & lo < max_intv
            pns_small = (pnsh == 0) & (pnsl < p3_max_intv)
            p_hit = p_ext & pch_ok & pns_small \
                & (pi - px >= min_seed_len)
            p_bad = p_ext & ~pch_ok
            p_emit = p_hit & ((pnsh > 0) | (pnsl > 0))
            p_can = p_emit & (st["pn"] < p3_seeds)
            p_hot = p_can[:, None] & (pidx == st["pn"][:, None])
            p_qspan = jnp.where(
                p_hot, ((px << 16) | (pi + 1))[:, None], st["p_qspan"])
            p_ilh = jnp.where(p_hot, pnkh[:, None], st["p_ilh"])
            p_ill = jnp.where(p_hot, pnkl[:, None], st["p_ill"])
            p_isz = jnp.where(p_hot, _sz32(pnsh, pnsl)[:, None],
                              st["p_isz"])
            pn = st["pn"] + p_can.astype(jnp.int32)
            pnfull = st["pnfull"] + (p_emit & ~p_can).astype(jnp.int32)
            p_restart = p_hit | p_bad
            p_adv = p_ext & ~p_restart
            pkh = jnp.where(p_adv, pnkh, pkh)
            pkl = jnp.where(p_adv, pnkl, pkl)
            plh = jnp.where(p_adv, pnlh, plh)
            pll = jnp.where(p_adv, pnll, pll)
            psh = jnp.where(p_adv, pnsh, psh)
            psl = jnp.where(p_adv, pnsl, psl)
            p_newx = jnp.where(p_restart, pi + 1, px)
            p_newneed = pneed | p_restart
            pi = jnp.where(p_adv, pi + 1, pi)
            pdone = st["pdone"] | (p_newneed & (p_newx >= lens))
        cc = jnp.where(is_fwd, jnp.clip(3 - ch, 0, 3),
                       jnp.minimum(ch, 3))
        nkh = jnp.where(is_fwd, _take4(L4h_, cc), _take4(K4h_, cc))
        nkl = jnp.where(is_fwd, _take4(L4l_, cc), _take4(K4l_, cc))
        nlh = jnp.where(is_fwd, _take4(K4h_, cc), _take4(L4h_, cc))
        nll = jnp.where(is_fwd, _take4(K4l_, cc), _take4(L4l_, cc))
        nsh = _take4(S4h_, cc)
        nsl = _take4(S4l_, cc)
        ns_lt_min = hl_lt(nsh, nsl, jnp.zeros_like(nsh), min_intv)

        # ---- FWD lanes ----------------------------------------------
        f_ok = is_fwd & ch_ok
        changed = f_ok & ((nsh != st["sh"]) | (nsl != st["sl"]))
        die = changed & ns_lt_min
        hit_end = is_fwd & ~ch_ok
        push = changed | hit_end          # push the OLD (k,l,s,end)
        hot_p = push[:, None] & (cidx == (st["sn"] % C)[:, None])
        skh = jnp.where(hot_p, st["kh"][:, None], st["skh"])
        skl = jnp.where(hot_p, st["kl"][:, None], st["skl"])
        slh = jnp.where(hot_p, st["lh"][:, None], st["slh"])
        sll = jnp.where(hot_p, st["ll"][:, None], st["sll"])
        ssh = jnp.where(hot_p, st["sh"][:, None], st["ssh"])
        ssl = jnp.where(hot_p, st["sl"][:, None], st["ssl"])
        se = jnp.where(hot_p, st["end"][:, None], st["se"])
        sn = st["sn"] + push.astype(jnp.int32)
        adv = f_ok & ~die
        kh = jnp.where(adv, nkh, st["kh"])
        kl = jnp.where(adv, nkl, st["kl"])
        lh = jnp.where(adv, nlh, st["lh"])
        ll = jnp.where(adv, nll, st["ll"])
        sh = jnp.where(adv, nsh, st["sh"])
        sl = jnp.where(adv, nsl, st["sl"])
        end = jnp.where(adv, ip + 1, st["end"])
        fwd_dead = die | hit_end
        nx = jnp.where(fwd_dead, end, st["nx"])

        # ---- BWD lanes ----------------------------------------------
        b_die = is_bwd & (~ch_ok | ns_lt_min)
        b_adv = is_bwd & ~b_die
        e_start = ip + 1
        want = b_die & (st["be"] - e_start >= min_seed_len) \
            & (e_start < st["last_i"] + 1)
        emit = want & (st["n"] < max_seeds)
        hot_e = emit[:, None] & (sidx == st["n"][:, None])
        qspan = jnp.where(
            hot_e, ((e_start << 16) | st["be"])[:, None], st["qspan"])
        il_hi = jnp.where(hot_e, st["bkh"][:, None], st["il_hi"])
        il_lo = jnp.where(hot_e, st["bkl"][:, None], st["il_lo"])
        isz = jnp.where(hot_e, _sz32(st["bsh"], st["bsl"])[:, None],
                        st["isz"])
        n = st["n"] + emit.astype(jnp.int32)
        nfull = st["nfull"] + (want & ~emit).astype(jnp.int32)
        last_i = jnp.where(emit, ip, st["last_i"])

        bj1 = st["bj"] - 1
        bwd_done = b_die & ((bj1 < 0) | (bj1 < sn - C))
        to_entry = b_die & ~bwd_done
        rounds = st["rounds"] + bwd_done.astype(jnp.int32)

        x = jnp.where(bwd_done, nx, st["x"])
        i = jnp.where(is_fwd | to_entry,
                      jnp.where(f_ok & ~fwd_dead, ip + 1, st["x"] - 1),
                      jnp.where(b_adv, ip - 1, ip))
        bj = jnp.where(fwd_dead, sn - 1, jnp.where(b_die, bj1, st["bj"]))
        need_load = fwd_dead | to_entry
        hot_l = need_load[:, None] \
            & (cidx == (jnp.maximum(bj, 0) % C)[:, None])

        def sel(arr, hot):
            return jnp.sum(jnp.where(hot, arr, 0), axis=1)

        bkh = jnp.where(need_load, sel(skh, hot_l),
                        jnp.where(b_adv, nkh, st["bkh"]))
        bkl = jnp.where(need_load, sel(skl, hot_l),
                        jnp.where(b_adv, nkl, st["bkl"]))
        blh = jnp.where(need_load, sel(slh, hot_l),
                        jnp.where(b_adv, nlh, st["blh"]))
        bll = jnp.where(need_load, sel(sll, hot_l),
                        jnp.where(b_adv, nll, st["bll"]))
        bsh = jnp.where(need_load, sel(ssh, hot_l),
                        jnp.where(b_adv, nsh, st["bsh"]))
        bsl = jnp.where(need_load, sel(ssl, hot_l),
                        jnp.where(b_adv, nsl, st["bsl"]))
        be = jnp.where(need_load, sel(se, hot_l), st["be"])
        last_i = jnp.where(fwd_dead, jnp.int32(2**30), last_i)
        mode = jnp.where(fwd_dead, _M_BWD,
                         jnp.where(bwd_done,
                                   jnp.where(rounds >= max_rounds,
                                             _M_DONE, _M_INIT), mode))

        # ---- INIT fold-in -------------------------------------------
        is_init = mode == _M_INIT
        past = x >= lens
        c0 = jnp.where(is_init & ~past,
                       reads[bidx, jnp.clip(x, 0, L - 1)],
                       4).astype(jnp.int32)
        c0c = jnp.minimum(c0, 3)
        s0h, s0l = l2_diff(c0c)
        s0_pos = (s0h > 0) | (s0l > 0)
        s0_ge_min = ~hl_lt(s0h, s0l, jnp.zeros_like(s0h), min_intv)
        ok0 = is_init & ~past & (c0 < 4) & s0_ge_min & s0_pos
        skip = is_init & ~past & ~ok0
        x = jnp.where(skip, x + 1, x)
        rounds = rounds + skip.astype(jnp.int32)
        mode = jnp.where(is_init & past, _M_DONE,
                         jnp.where(ok0, _M_FWD,
                                   jnp.where(skip & (rounds >= max_rounds),
                                             _M_DONE, mode)))
        i0h, i0l = l2_at(c0c)
        k0h, k0l = hl_add_small(i0h, i0l, 1)
        r0h, r0l = l2_at(3 - c0c)
        l0h, l0l = hl_add_small(r0h, r0l, 1)
        kh = jnp.where(ok0, k0h, kh)
        kl = jnp.where(ok0, k0l, kl)
        lh = jnp.where(ok0, l0h, lh)
        ll = jnp.where(ok0, l0l, ll)
        sh = jnp.where(ok0, s0h, sh)
        sl = jnp.where(ok0, s0l, sl)
        end = jnp.where(ok0, x + 1, end)
        i = jnp.where(ok0, x + 1, i)
        sn = jnp.where(ok0, 0, sn)

        out = dict(mode=mode, x=x, nx=nx, i=i,
                   kh=kh, kl=kl, lh=lh, ll=ll, sh=sh, sl=sl, end=end,
                   skh=skh, skl=skl, slh=slh, sll=sll, ssh=ssh,
                   ssl=ssl, se=se, sn=sn,
                   bj=bj, bkh=bkh, bkl=bkl, blh=blh, bll=bll, bsh=bsh,
                   bsl=bsl, be=be, last_i=last_i,
                   rounds=rounds, qspan=qspan, il_hi=il_hi, il_lo=il_lo,
                   isz=isz, n=n, nfull=nfull,
                   it=st["it"] + 1)
        if p3_seeds:
            out.update(px=p_newx, pi=pi,
                       pkh=pkh, pkl=pkl, plh=plh, pll=pll,
                       psh=psh, psl=psl,
                       pneed=p_newneed, pdone=pdone, p_qspan=p_qspan,
                       p_ilh=p_ilh, p_ill=p_ill, p_isz=p_isz,
                       pn=pn, pnfull=pnfull)
        return out

    def cond(st):
        busy = jnp.any(st["mode"] != _M_DONE)
        if p3_seeds:
            busy = busy | jnp.any(~st["pdone"])
        return busy & (st["it"] < step_cap)

    U = _unroll()

    def bodyU(st):
        for _ in range(U):
            st = body(st)
        return st

    # carry packed into THREE tensors + a scalar (same rationale as
    # the int32 machine: fixed per-buffer cost every loop iteration)
    scalar_keys = ["mode", "x", "nx", "i", "kh", "kl", "lh", "ll",
                   "sh", "sl", "end", "sn", "bj", "bkh", "bkl", "blh",
                   "bll", "bsh", "bsl", "be", "last_i", "rounds",
                   "n", "nfull"]
    bool_keys = set()
    if p3_seeds:
        scalar_keys += ["px", "pi", "pkh", "pkl", "plh", "pll",
                        "psh", "psl", "pneed", "pdone", "pn", "pnfull"]
        bool_keys = {"pneed", "pdone"}
    mat_keys = ("skh", "skl", "slh", "sll", "ssh", "ssl", "se")
    em_keys = ("qspan", "il_hi", "il_lo", "isz")
    p3_em = ("p_qspan", "p_ilh", "p_ill", "p_isz")

    def pack(d):
        sv = jnp.stack([d[k].astype(jnp.int32) for k in scalar_keys])
        mt = jnp.stack([d[k] for k in mat_keys])
        if p3_seeds:
            em = jnp.stack([jnp.concatenate([d[a], d[b]], axis=1)
                            for a, b in zip(em_keys, p3_em)])
        else:
            em = jnp.stack([d[k] for k in em_keys])
        return sv, mt, em, d["it"]

    def unpack(c):
        sv, mt, em, it = c
        d = {k: (sv[j] != 0 if k in bool_keys else sv[j])
             for j, k in enumerate(scalar_keys)}
        for j, k in enumerate(mat_keys):
            d[k] = mt[j]
        if p3_seeds:
            for j, (a, b) in enumerate(zip(em_keys, p3_em)):
                d[a] = em[j, :, :max_seeds]
                d[b] = em[j, :, max_seeds:]
        else:
            for j, k in enumerate(em_keys):
                d[k] = em[j]
        d["it"] = it
        return d

    st = unpack(jax.lax.while_loop(
        lambda c: cond(unpack(c)),
        lambda c: pack(bodyU(unpack(c))), pack(st)))
    truncated = (st["mode"] != _M_DONE).astype(jnp.int32)
    out = dict(qbeg=st["qspan"] >> 16, qend=st["qspan"] & 0xFFFF,
               il_hi=st["il_hi"], il_lo=st["il_lo"],
               intv_sz=st["isz"], n_seeds=st["n"],
               n_dropped=st["nfull"] + truncated)
    if p3_seeds:
        out.update(p3_qbeg=st["p_qspan"] >> 16,
                   p3_qend=st["p_qspan"] & 0xFFFF,
                   p3_il_hi=st["p_ilh"], p3_il_lo=st["p_ill"],
                   p3_intv_sz=st["p_isz"], p3_n=st["pn"])
    return out


@functools.partial(jax.jit, static_argnames=("max_seeds", "min_seed_len",
                                             "max_prev", "p3_seeds",
                                             "p3_max_intv"))
def smem_collect_wide(fm: DeviceFMIndexHiLo, reads, lens,
                      max_seeds: int = 16, min_seed_len: int = 19,
                      max_prev: int = 8, p3_seeds: int = 0,
                      p3_max_intv: int = 20):
    """Wide twin of ``ops.fm.smem_collect`` (all bwa pass-1 SMEMs, with
    the optional fused pass-3 strategy scan)."""
    B, L = reads.shape
    kw = dict(p3_seeds=p3_seeds, p3_max_intv=p3_max_intv) \
        if p3_seeds else {}
    return smem_machine_wide(
        fm, reads, lens,
        x0=jnp.zeros(B, jnp.int32),
        min_intv=jnp.ones(B, jnp.int32),
        active=lens > 0,
        max_seeds=max_seeds, min_seed_len=min_seed_len, C=max_prev,
        max_rounds=L, step_cap=4 * L + 16, **kw)


@functools.partial(jax.jit, static_argnames=("min_seed_len", "max_prev"))
def smem_reseed_wide(fm: DeviceFMIndexHiLo, reads, lens, qb, qe, occ,
                     active, min_seed_len: int = 19, max_prev: int = 8):
    """Wide twin of ``ops.fm.smem_reseed`` (bwa's 2nd pass: re-seed one
    long near-unique seed from its midpoint with min_intv = occ+1)."""
    B, L = reads.shape
    R = 4
    mid = (qb + qe) // 2
    acc = smem_machine_wide(
        fm, reads, lens, x0=mid, min_intv=occ + 1, active=active,
        max_seeds=R, min_seed_len=min_seed_len, C=max_prev,
        max_rounds=1, step_cap=2 * L + 8)
    slen = acc["qend"] - acc["qbeg"]
    valid = jnp.arange(R)[None, :] < acc["n_seeds"][:, None]
    pick = jnp.argmax(jnp.where(valid, slen, -1), axis=1)
    bidx = jnp.arange(B)
    got = valid[bidx, pick] & active
    z = jnp.zeros(B, jnp.int32)
    return (jnp.where(got, acc["qbeg"][bidx, pick], z),
            jnp.where(got, acc["qend"][bidx, pick], z),
            jnp.where(got, acc["il_hi"][bidx, pick], z),
            jnp.where(got, acc["il_lo"][bidx, pick], z),
            jnp.where(got, acc["intv_sz"][bidx, pick], z))


def bwt_char_wide(fm: DeviceFMIndexHiLo, r_hi, r_lo):
    """Stored-bwt code at bwt position r (sentinel-adjusted pair)."""
    blk = hl_shift_right(r_hi, r_lo, 7)
    word = fm.blocks_hl[blk, 8 + ((r_lo >> 4) & 7)].astype(jnp.uint32)
    shift = (2 * (15 - (r_lo & 15))).astype(jnp.uint32)
    return ((word >> shift) & jnp.uint32(3)).astype(jnp.int32)


@jax.jit
def sa_lookup_wide(fm: DeviceFMIndexHiLo, r_hi, r_lo):
    """Wide twin of ``ops.fm.sa_lookup``: LF-walk to a sampled-SA rank.

    Input ranks as (hi, lo); invalid lanes marked hi < 0.  Returns
    (pos_hi, pos_lo) with pos_hi = -1 for invalid lanes.

    sa_intv is a power of two <= 2^30, so ``rank % sa_intv`` and
    ``rank // sa_intv`` read only/mostly the lo plane
    (2^30 % sa_intv == 0)."""
    invalid = r_hi < 0
    rh = jnp.maximum(r_hi, 0).astype(jnp.int32)
    rl = jnp.where(invalid, 0, r_lo).astype(jnp.int32)
    p_h, p_l = fm.primary_hi, fm.primary_lo
    if fm.sa_intv == 1:          # full SA resident: a single gather
        # full-SA residency only exists for small in-memory indexes
        # (a wide-size full SA would not fit HBM), so the flat rank
        # fits int32
        assert fm.seq_len < (1 << 31), "full SA on a wide index"
        idx = rh * (1 << LO_BITS) + rl
        is_prim = (rh == p_h) & (rl == p_l)
        ph = jnp.where(is_prim, 0, fm.sa_hi[idx])
        pl = jnp.where(is_prim, 0, fm.sa_lo[idx])
        return (jnp.where(invalid, -1, ph),
                jnp.where(invalid, 0, pl))
    assert (1 << LO_BITS) % fm.sa_intv == 0
    done0 = invalid | (rl % fm.sa_intv == 0) \
        | ((rh == p_h) & (rl == p_l))

    def cond(c):
        sv, it = c
        return (~jnp.all(sv[4] != 0)) & (it < 64 * fm.sa_intv)

    def body(c):
        sv, it = c
        rh_, rl_, steps = sv[0], sv[1], sv[2]
        done = sv[4] != 0
        gt = hl_lt(p_h, p_l, rh_, rl_)
        bh, bl = hl_sub(rh_, rl_, jnp.zeros_like(rh_),
                        gt.astype(jnp.int32))
        ch = bwt_char_wide(fm, bh, bl)
        q_h, q_l = rank_full_hilo(fm, ch, rh_, rl_)
        # two lo planes (each < 2^30) + 1 stay inside int32;
        # hl_add_small's single carry normalizes the pair
        lfh, lfl = hl_add_small(fm.L2_hi[ch] + q_h,
                                fm.L2_lo[ch] + q_l, 1)
        nrh = jnp.where(done, rh_, lfh)
        nrl = jnp.where(done, rl_, lfl)
        nsteps = jnp.where(done, steps, steps + 1)
        ndone = done | (nrl % fm.sa_intv == 0) \
            | ((nrh == p_h) & (nrl == p_l))
        return (jnp.stack([nrh, nrl, nsteps, sv[3],
                           ndone.astype(jnp.int32)]), it + 1)

    init = (jnp.stack([rh, rl, jnp.zeros_like(rh), jnp.zeros_like(rh),
                       done0.astype(jnp.int32)]), jnp.int32(0))
    sv, _ = jax.lax.while_loop(cond, body, init)
    rh_f, rl_f, steps = sv[0], sv[1], sv[2]
    sa_idx = hl_shift_right(rh_f, rl_f,
                            int(fm.sa_intv).bit_length() - 1)
    is_prim = (rh_f == p_h) & (rl_f == p_l)
    bh = jnp.where(is_prim, 0, fm.sa_hi[sa_idx])
    bl = jnp.where(is_prim, 0, fm.sa_lo[sa_idx])
    ph, pl = hl_add_small(bh, bl, steps)
    return jnp.where(invalid, -1, ph), jnp.where(invalid, 0, pl)
