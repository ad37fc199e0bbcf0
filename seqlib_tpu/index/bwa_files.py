"""bwa on-disk index formats (.pac/.bwt/.sa/.ann/.amb).

Byte-exact read/write parity with the files written by ``bwa index``
and by the reference's ``BWAIndex::WriteIndex``
(/root/reference/src/BWAIndex.cpp:360-406): 64-bit bwtint fields,
OCC_INTERVAL=0x80 interleaved occ counts in .bwt, SA interval 32 in
.sa.  Verified against /root/reference/tests/data/tiny.fa.* in
tests/test_index.py.
"""

from __future__ import annotations

import struct

import numpy as np

from .pack import (Annotation, Hole, PackedReference, pac_bytes,
                   codes_from_pac)

OCC_INTERVAL = 0x80   # 128 bases between occ checkpoints
SA_INTERVAL = 32


# ---------------------------------------------------------------------------
# .pac
# ---------------------------------------------------------------------------

def write_pac(path: str, codes: np.ndarray) -> None:
    data = pac_bytes(codes)
    l_pac = codes.size
    with open(path, "wb") as fh:
        fh.write(data)
        if l_pac % 4 == 0:
            fh.write(b"\x00")
        fh.write(bytes([l_pac % 4]))


def read_pac(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        data = fh.read()
    mod = data[-1]
    if mod == 0:
        body = data[:-2]
        l_pac = len(body) * 4
    else:
        body = data[:-1]
        l_pac = (len(body) - 1) * 4 + mod
    return codes_from_pac(body, l_pac)


# ---------------------------------------------------------------------------
# .ann / .amb (text)
# ---------------------------------------------------------------------------

def write_ann(path: str, ref: PackedReference) -> None:
    with open(path, "w") as fh:
        fh.write(f"{ref.l_pac} {len(ref.anns)} {ref.seed}\n")
        for a in ref.anns:
            fh.write(f"{a.gi} {a.name} {a.anno}\n")
            fh.write(f"{a.offset} {a.length} {a.n_amb}\n")


def write_amb(path: str, ref: PackedReference) -> None:
    with open(path, "w") as fh:
        fh.write(f"{ref.l_pac} {len(ref.anns)} {len(ref.holes)}\n")
        for h in ref.holes:
            fh.write(f"{h.offset} {h.length} {h.amb}\n")


def read_ann(path: str) -> tuple[int, int, list[Annotation]]:
    with open(path) as fh:
        l_pac, n_seqs, seed = (int(x) for x in fh.readline().split())
        anns = []
        for _ in range(n_seqs):
            parts = fh.readline().split(None, 2)
            gi = int(parts[0])
            name = parts[1]
            anno = parts[2].strip() if len(parts) > 2 else "(null)"
            off, ln, n_amb = (int(x) for x in fh.readline().split())
            anns.append(Annotation(name, off, ln, n_amb, gi, anno))
    return l_pac, seed, anns


def read_amb(path: str) -> list[Hole]:
    with open(path) as fh:
        _l_pac, _n, n_holes = (int(x) for x in fh.readline().split())
        holes = []
        for _ in range(n_holes):
            off, ln, ch = fh.readline().split()
            holes.append(Hole(int(off), int(ln), ch))
    return holes


# ---------------------------------------------------------------------------
# .bwt  (primary, L2[1..4], interleaved bwt+occ words)
# ---------------------------------------------------------------------------

def interleave_occ(bwt_codes: np.ndarray) -> np.ndarray:
    """Pack 2-bit BWT with occ checkpoints every OCC_INTERVAL bases.

    Layout per 128-base block: 4 x uint64 cumulative counts (as 8
    uint32 words) followed by 8 uint32 data words (16 bases each,
    first base in the top 2 bits).  A final counts block is appended.
    """
    n = bwt_codes.size
    n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
    # pad codes to a whole number of blocks
    padded = np.zeros(n_blocks * OCC_INTERVAL, dtype=np.uint8)
    padded[:n] = bwt_codes
    blocks = padded.reshape(n_blocks, OCC_INTERVAL)
    # per-block counts of each symbol (only over real positions)
    valid = (np.arange(n_blocks * OCC_INTERVAL).reshape(
        n_blocks, OCC_INTERVAL) < n)
    onehot = (blocks[..., None] == np.arange(4)) & valid[..., None]
    per_block = onehot.sum(axis=1).astype(np.uint64)          # [B, 4]
    cum = np.zeros((n_blocks + 1, 4), dtype=np.uint64)
    np.cumsum(per_block, axis=0, out=cum[1:])
    # data words: 16 bases per uint32, first base at bits 30..31
    q = padded.reshape(n_blocks, 8, 16).astype(np.uint32)
    shifts = np.arange(15, -1, -1, dtype=np.uint32) * 2
    words = (q << shifts).sum(axis=2, dtype=np.uint32)        # [B, 8]
    out = np.empty(n_blocks * 16 + 8, dtype=np.uint32)
    body = out[:n_blocks * 16].reshape(n_blocks, 16)
    body[:, 0:8] = cum[:-1].view(np.uint32).reshape(n_blocks, 8)
    body[:, 8:16] = words
    out[n_blocks * 16:] = cum[-1].view(np.uint32)
    return out


def deinterleave_occ(words: np.ndarray, seq_len: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of interleave_occ -> (bwt_codes, checkpoint_counts)."""
    n_blocks = (seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL
    body = words[:n_blocks * 16].reshape(n_blocks, 16)
    cps = body[:, 0:8].copy().view(np.uint64).reshape(n_blocks, 4)
    data = body[:, 8:16]
    shifts = np.arange(15, -1, -1, dtype=np.uint32) * 2
    codes = ((data[:, :, None] >> shifts) & 3).astype(np.uint8)
    return codes.reshape(-1)[:seq_len], cps


def write_bwt(path: str, primary: int, L2: np.ndarray,
              interleaved: np.ndarray) -> None:
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", primary))
        fh.write(np.asarray(L2[1:5], dtype=np.uint64).tobytes())
        fh.write(interleaved.astype("<u4").tobytes())


def read_bwt(path: str) -> tuple[int, np.ndarray, np.ndarray]:
    with open(path, "rb") as fh:
        primary = struct.unpack("<Q", fh.read(8))[0]
        l2tail = np.frombuffer(fh.read(32), dtype="<u8")
        words = np.frombuffer(fh.read(), dtype="<u4")
    L2 = np.zeros(5, dtype=np.uint64)
    L2[1:5] = l2tail
    return primary, L2, words.copy()


# ---------------------------------------------------------------------------
# .sa  (primary, L2[1..4], sa_intv, seq_len, sa[1..n_sa-1])
# ---------------------------------------------------------------------------

def write_sa(path: str, primary: int, L2: np.ndarray, sa_intv: int,
             seq_len: int, sa_samples: np.ndarray) -> None:
    """sa_samples[0] corresponds to rank 0 and is NOT written
    (bwa dumps sa+1; sa[0] is the -1 placeholder)."""
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", primary))
        fh.write(np.asarray(L2[1:5], dtype=np.uint64).tobytes())
        fh.write(struct.pack("<QQ", sa_intv, seq_len))
        fh.write(sa_samples[1:].astype("<u8").tobytes())


def read_sa(path: str) -> tuple[int, int, int, np.ndarray]:
    with open(path, "rb") as fh:
        primary = struct.unpack("<Q", fh.read(8))[0]
        fh.read(32)  # L2
        sa_intv, seq_len = struct.unpack("<QQ", fh.read(16))
        body = np.frombuffer(fh.read(), dtype="<u8")
    n_sa = (seq_len + sa_intv - 1) // sa_intv + 1
    sa = np.empty(n_sa, dtype=np.uint64)
    sa[0] = np.uint64(0xFFFFFFFFFFFFFFFF)
    sa[1:1 + body.size] = body
    return primary, int(sa_intv), int(seq_len), sa
