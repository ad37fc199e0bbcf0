"""Sequence encoding tables and primitives.

TPU-native framework keeps sequences as small integer codes in numpy /
jax arrays:

* **nt4 code**: A=0 C=1 G=2 T=3, anything else = 4 (N).  This is the
  device-side alphabet used by the FM-index and all alignment kernels
  (mirrors the role of ``nst_nt4_table`` consumed by the reference at
  /root/reference/src/BWAIndex.cpp:198).
* **nib code** (BAM 4-bit): ``=ACMGRSVTWYHKDBN`` with A=1 C=2 G=4 T=8
  N=15, two bases per byte, as stored in BAM records (reference
  packing: /root/reference/src/BamRecord.cpp:255-274).

Reverse complement uses a 128-entry ASCII table like the reference's
``rcomplement`` (/root/reference/SeqLib/SeqLibUtils.h:107-113).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# nt4: ASCII -> {0,1,2,3,4}
# ---------------------------------------------------------------------------

NT4_TABLE = np.full(256, 4, dtype=np.uint8)
for _i, _b in enumerate(b"ACGT"):
    NT4_TABLE[_b] = _i
    NT4_TABLE[ord(chr(_b).lower())] = _i

NT4_TO_ASCII = np.frombuffer(b"ACGTN", dtype=np.uint8)

# ---------------------------------------------------------------------------
# BAM 4-bit nibble code
# ---------------------------------------------------------------------------

SEQ_NT16_STR = "=ACMGRSVTWYHKDBN"
NIB_TO_ASCII = np.frombuffer(SEQ_NT16_STR.encode(), dtype=np.uint8)

ASCII_TO_NIB = np.full(256, 15, dtype=np.uint8)
for _i, _c in enumerate(SEQ_NT16_STR):
    ASCII_TO_NIB[ord(_c)] = _i
    ASCII_TO_NIB[ord(_c.lower())] = _i

# nib -> nt4 (A,C,G,T nibbles to 0..3; everything ambiguous to 4)
NIB_TO_NT4 = np.full(16, 4, dtype=np.uint8)
NIB_TO_NT4[1] = 0  # A
NIB_TO_NT4[2] = 1  # C
NIB_TO_NT4[4] = 2  # G
NIB_TO_NT4[8] = 3  # T

NT4_TO_NIB = np.array([1, 2, 4, 8, 15], dtype=np.uint8)

# ---------------------------------------------------------------------------
# ASCII complement table (128 entries like SeqLibCommon.h:20-26)
# ---------------------------------------------------------------------------

COMPLEMENT_TABLE = np.arange(256, dtype=np.uint8)
for _a, _b in [(b"A", b"T"), (b"C", b"G"), (b"G", b"C"), (b"T", b"A"),
               (b"a", b"t"), (b"c", b"g"), (b"g", b"c"), (b"t", b"a"),
               (b"N", b"N"), (b"n", b"n")]:
    COMPLEMENT_TABLE[_a[0]] = _b[0]


def encode_nt4(seq: str | bytes) -> np.ndarray:
    """ASCII sequence -> nt4 codes (uint8 array)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return NT4_TABLE[np.frombuffer(seq, dtype=np.uint8)]


def decode_nt4(codes: np.ndarray) -> str:
    """nt4 codes -> ASCII string (4 -> 'N')."""
    return NT4_TO_ASCII[np.asarray(codes, dtype=np.uint8)].tobytes().decode()


def revcomp(seq: str) -> str:
    """Reverse complement of an ASCII sequence.

    Parity target: ``SeqLib::rcomplement``
    (/root/reference/SeqLib/SeqLibUtils.h:107-113).
    """
    arr = np.frombuffer(seq.encode(), dtype=np.uint8)
    return COMPLEMENT_TABLE[arr][::-1].tobytes().decode()


def revcomp_nt4(codes: np.ndarray) -> np.ndarray:
    """Reverse complement in nt4 space: c -> 3-c for c<4, N stays N."""
    codes = np.asarray(codes, dtype=np.uint8)
    out = np.where(codes < 4, 3 - codes, codes)
    return out[::-1]


def pack_nibbles(seq: str | bytes) -> bytes:
    """ASCII -> BAM 4-bit packed bytes, two bases/byte, high nibble first.

    Mirrors record packing at /root/reference/src/BamRecord.cpp:255-274.
    """
    if isinstance(seq, str):
        seq = seq.encode()
    nibs = ASCII_TO_NIB[np.frombuffer(seq, dtype=np.uint8)]
    if len(nibs) % 2:
        nibs = np.concatenate([nibs, np.zeros(1, dtype=np.uint8)])
    packed = (nibs[0::2] << 4) | nibs[1::2]
    return packed.tobytes()


def unpack_nibbles(data: bytes, length: int) -> str:
    """BAM 4-bit packed bytes -> ASCII sequence of `length` bases."""
    arr = np.frombuffer(data, dtype=np.uint8)
    nibs = np.empty(arr.size * 2, dtype=np.uint8)
    nibs[0::2] = arr >> 4
    nibs[1::2] = arr & 0xF
    return NIB_TO_ASCII[nibs[:length]].tobytes().decode()
