"""Cigar / CigarField.

Parity targets: /root/reference/SeqLib/BamRecord.h:111-186 (classes) and
/root/reference/src/BamRecord.cpp:42-97 (parse/serialize/consumption).

Representation is numpy-friendly: a Cigar owns parallel ``ops``/``lens``
uint32 arrays using the standard BAM op codes (MIDNSHP=XB -> 0..9), so a
batch of CIGARs moves to device or into BAM bytes without re-encoding.
"""

from __future__ import annotations

import re

import numpy as np

CIGAR_OPS = "MIDNSHP=XB"
OP_TO_CODE = {c: i for i, c in enumerate(CIGAR_OPS)}

# which ops consume query / reference (SAM spec; BamRecord.cpp:42-61)
_QUERY_CONSUMERS = frozenset("MIS=X")
_REF_CONSUMERS = frozenset("MDN=X")

_CIGAR_RE = re.compile(r"([0-9]+)([MIDNSHPX=B])")


class CigarField:
    """One CIGAR element: op char + length.

    Parity: ``SeqLib::CigarField`` /root/reference/SeqLib/BamRecord.h:111-150.
    """

    __slots__ = ("_op", "_len")

    def __init__(self, op: str, length: int):
        if op not in OP_TO_CODE:
            raise ValueError(f"CigarField: invalid op {op!r}")
        if length <= 0:
            raise ValueError("CigarField: length must be positive")
        self._op = op
        self._len = int(length)

    @property
    def type(self) -> str:
        return self._op

    @property
    def length(self) -> int:
        return self._len

    def consumes_query(self) -> bool:
        return self._op in _QUERY_CONSUMERS

    def consumes_reference(self) -> bool:
        return self._op in _REF_CONSUMERS

    def __eq__(self, o):
        return (isinstance(o, CigarField) and self._op == o._op
                and self._len == o._len)

    def __hash__(self):
        return hash((self._op, self._len))

    def __repr__(self):
        return f"{self._len}{self._op}"


class Cigar:
    """Ordered list of CigarFields.

    Parity: ``SeqLib::Cigar`` /root/reference/SeqLib/BamRecord.h:152-186;
    string parse via regex BamRecord.cpp:83-97, consumption counts :42-61.
    """

    def __init__(self, arg=None):
        self.fields: list[CigarField] = []
        if arg is None:
            return
        if isinstance(arg, str):
            self._parse(arg)
        elif isinstance(arg, Cigar):
            self.fields = list(arg.fields)
        else:
            for f in arg:
                if isinstance(f, CigarField):
                    self.fields.append(f)
                else:
                    op, ln = f
                    if isinstance(op, (int, np.integer)):
                        op = CIGAR_OPS[op]
                    self.fields.append(CigarField(op, ln))

    def _parse(self, cig: str) -> None:
        if cig in ("", "*"):
            return
        pos = 0
        for m in _CIGAR_RE.finditer(cig):
            if m.start() != pos:
                raise ValueError(f"Cigar: malformed CIGAR string {cig!r}")
            pos = m.end()
            self.fields.append(CigarField(m.group(2), int(m.group(1))))
        if pos != len(cig):
            raise ValueError(f"Cigar: malformed CIGAR string {cig!r}")

    # -- factory from packed arrays -----------------------------------------

    @classmethod
    def from_arrays(cls, ops: np.ndarray, lens: np.ndarray) -> "Cigar":
        c = cls()
        c.fields = [CigarField(CIGAR_OPS[int(o)], int(l))
                    for o, l in zip(ops, lens)]
        return c

    @classmethod
    def from_bam_encoded(cls, enc: np.ndarray) -> "Cigar":
        """From BAM uint32 encoding: len<<4 | op."""
        enc = np.asarray(enc, dtype=np.uint32)
        return cls.from_arrays(enc & 0xF, enc >> 4)

    def to_bam_encoded(self) -> np.ndarray:
        return np.array(
            [(f.length << 4) | OP_TO_CODE[f.type] for f in self.fields],
            dtype=np.uint32)

    # -- mutation ------------------------------------------------------------

    def add(self, field: CigarField) -> None:
        self.fields.append(field)

    # -- queries -------------------------------------------------------------

    def num_query_consumed(self) -> int:
        """Bases of the query consumed (M/I/S/=/X)
        (parity: ``NumQueryConsumed`` BamRecord.cpp:42-51)."""
        return sum(f.length for f in self.fields if f.consumes_query())

    def num_reference_consumed(self) -> int:
        """Bases of the reference consumed (M/D/N/=/X)
        (parity: ``NumReferenceConsumed`` BamRecord.cpp:53-61)."""
        return sum(f.length for f in self.fields if f.consumes_reference())

    def __len__(self):
        return len(self.fields)

    def __getitem__(self, i):
        return self.fields[i]

    def __iter__(self):
        return iter(self.fields)

    def __eq__(self, o):
        return isinstance(o, Cigar) and self.fields == o.fields

    def __str__(self):
        if not self.fields:
            return "*"  # SAM convention for empty
        return "".join(f"{f.length}{f.type}" for f in self.fields)

    def __repr__(self):
        return f"Cigar({self!s})"
