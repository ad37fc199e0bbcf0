"""UnalignedSequence: a name/sequence/quality POD.

Parity: /root/reference/SeqLib/UnalignedSequence.h:12-54.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class UnalignedSequence:
    name: str = ""
    seq: str = ""
    qual: str = ""
    strand: str = "*"
    com: str = ""  # comment

    def to_fastq(self) -> str:
        """FASTQ block (parity: operator<< UnalignedSequence.h:44-53)."""
        qual = self.qual if self.qual else "I" * len(self.seq)
        return f"@{self.name}\n{self.seq}\n+\n{qual}\n"

    def to_fasta(self) -> str:
        return f">{self.name}\n{self.seq}\n"


UnalignedSequenceVector = list
