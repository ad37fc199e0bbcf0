"""BamHeader: SAM/BAM sequence dictionary + header text.

TPU-native redesign of the reference's ``BamHeader`` wrapper over
``bam_hdr_t`` (/root/reference/SeqLib/BamHeader.h:37-125,
/root/reference/src/BamHeader.cpp).  Here the header is a plain Python
object owning the SAM text and a name<->id dictionary; there is no raw
C struct to manage.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class HeaderSequence:
    """One @SQ entry (parity: ``SeqLib::HeaderSequence``
    /root/reference/SeqLib/BamHeader.h)."""

    name: str
    length: int


class BamHeader:
    """Sequence dictionary + full SAM header text.

    Construct from SAM text, from a list of (name, length), or empty.
    Parity targets: constructors at /root/reference/src/BamHeader.cpp:12-47,
    name<->id hash :56-64,97-106, lengths :49-76, text dump :88-95.
    """

    def __init__(self, arg=None):
        self._text = ""
        self._names: list[str] = []
        self._lengths: list[int] = []
        self._name2id: dict[str, int] = {}
        if arg is None:
            return
        if isinstance(arg, str):
            self._from_text(arg)
        else:
            # iterable of HeaderSequence or (name, length)
            seqs = []
            for s in arg:
                if isinstance(s, HeaderSequence):
                    seqs.append((s.name, s.length))
                else:
                    seqs.append((str(s[0]), int(s[1])))
            self._from_sequences(seqs)

    # -- construction -------------------------------------------------------

    def _from_sequences(self, seqs: list[tuple[str, int]]) -> None:
        lines = ["@HD\tVN:1.4"]
        for name, ln in seqs:
            lines.append(f"@SQ\tSN:{name}\tLN:{ln}")
        self._text = "\n".join(lines) + "\n"
        for name, ln in seqs:
            self._add_seq(name, ln)

    def _from_text(self, text: str) -> None:
        self._text = text
        for line in text.splitlines():
            if line.startswith("@SQ"):
                name, ln = None, None
                for f in line.split("\t")[1:]:
                    if f.startswith("SN:"):
                        name = f[3:]
                    elif f.startswith("LN:"):
                        ln = int(f[3:])
                if name is not None and ln is not None:
                    self._add_seq(name, ln)

    def _add_seq(self, name: str, length: int) -> None:
        self._name2id[name] = len(self._names)
        self._names.append(name)
        self._lengths.append(length)

    # -- queries ------------------------------------------------------------

    def is_empty(self) -> bool:
        """True when constructed empty (parity: ``isEmpty``)."""
        return not self._names and not self._text

    def num_sequences(self) -> int:
        return len(self._names)

    def name2id(self, name: str) -> int:
        """Name -> reference id, -1 if not found (parity: ``Name2ID``)."""
        return self._name2id.get(name, -1)

    def id2name(self, tid: int) -> str:
        """Reference id -> name; raises on out-of-range
        (parity: ``IDtoName`` which throws std::out_of_range)."""
        if tid < 0 or tid >= len(self._names):
            raise IndexError(
                f"BamHeader.id2name - id {tid} out of range "
                f"(n={len(self._names)})")
        return self._names[tid]

    def get_sequence_length(self, ref) -> int:
        """Sequence length by id or name, -1 if unknown
        (parity: ``GetSequenceLength`` /root/reference/src/BamHeader.cpp:49-76)."""
        if isinstance(ref, str):
            ref = self.name2id(ref)
        if ref < 0 or ref >= len(self._lengths):
            return -1
        return self._lengths[ref]

    def as_string(self) -> str:
        """Full SAM header text (parity: ``AsString``)."""
        return self._text

    def sequences(self) -> list[HeaderSequence]:
        return [HeaderSequence(n, l)
                for n, l in zip(self._names, self._lengths)]

    # pythonic aliases
    IDtoName = id2name
    Name2ID = name2id

    def __len__(self) -> int:
        return len(self._names)

    def __eq__(self, other) -> bool:
        return isinstance(other, BamHeader) and self._text == other._text

    def __repr__(self) -> str:
        return f"BamHeader({len(self._names)} sequences)"
