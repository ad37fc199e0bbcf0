"""Sharded FM-index: references past the single-device int32 bound.

The device FM-index keeps ranks in int32, bounding one shard's 2L text
to 2^31 (~1 Gbp of genome; ops/fm.py).  For larger references —
BASELINE.md config 4 (full hg19/hg38 in HBM) — contigs are greedily
packed, in their original order, into shards whose forward length
stays under ``max_shard_bp``; each shard is a complete, independent
:class:`FMIndex`.  Alignment against a sharded index runs the fused
stage-1 pipeline per shard (sequentially on one chip, or one shard
per device — the tensor-parallel analog from SURVEY.md §2.2) and
merges regions globally (align/sharded.py).

No reference counterpart: SeqLib loads exactly one ``bwaidx_t``
(/root/reference/src/BWAIndex.cpp:28-33); sharding exists only to map
the same capability onto TPU int32/HBM budgets.
"""

from __future__ import annotations

from .fmindex import FMIndex
from ..core.header import BamHeader

# one shard's forward strand; 2L text = 2x this, safely < 2^31
DEFAULT_MAX_SHARD_BP = 1_000_000_000


class ShardedFMIndex:
    """Ordered list of FMIndex shards presenting one global reference.

    Global contig ids are assigned in input order; shard boundaries
    never split a contig, so ``first_rid[s] + local_rid`` recovers the
    global id.
    """

    def __init__(self, shards: list[FMIndex], first_rid: list[int]):
        self.shards = shards
        self.first_rid = first_rid

    @classmethod
    def construct(cls, seqs, max_shard_bp: int = DEFAULT_MAX_SHARD_BP
                  ) -> "ShardedFMIndex":
        """Build from [(name, seq)] or UnalignedSequence list.

        Contigs are packed first-fit in order; a single contig longer
        than ``max_shard_bp`` gets its own shard (valid while it stays
        under the ~1.07 Gbp device bound — no natural chromosome
        approaches it).
        """
        pairs = []
        for s in seqs:
            if hasattr(s, "name"):
                pairs.append((s.name, s.seq))
            else:
                pairs.append((s[0], s[1]))
        if not pairs:
            raise ValueError(
                "ShardedFMIndex::construct - empty sequence list")
        groups: list[list[tuple[str, str]]] = []
        cur: list[tuple[str, str]] = []
        cur_bp = 0
        for name, seq in pairs:
            if cur and cur_bp + len(seq) > max_shard_bp:
                groups.append(cur)
                cur, cur_bp = [], 0
            cur.append((name, seq))
            cur_bp += len(seq)
        if cur:
            groups.append(cur)
        shards = [FMIndex.construct(g) for g in groups]
        first_rid, n = [], 0
        for g in groups:
            first_rid.append(n)
            n += len(g)
        return cls(shards, first_rid)

    # -- global reference views (FMIndex API parity) --------------------

    @property
    def n_shards(self) -> int:
        return len(self.shards)

    def num_sequences(self) -> int:
        return sum(s.num_sequences() for s in self.shards)

    def _locate_shard(self, rid: int) -> tuple[int, int]:
        if rid < 0 or rid >= self.num_sequences():
            raise IndexError(
                f"ShardedFMIndex - contig id {rid} out of bounds")
        s = self.n_shards - 1
        while self.first_rid[s] > rid:
            s -= 1
        return s, rid - self.first_rid[s]

    def chr_id_to_name(self, i: int) -> str:
        s, local = self._locate_shard(i)
        return self.shards[s].chr_id_to_name(local)

    def sam_header_text(self) -> str:
        return "".join(s.sam_header_text() for s in self.shards)

    def header_from_index(self) -> BamHeader:
        return BamHeader(self.sam_header_text())

    def write(self, prefix: str) -> None:
        """Write each shard in bwa's on-disk format as
        ``<prefix>.shard<k>.{bwt,sa,ann,amb,pac}`` plus a
        ``<prefix>.shards`` JSON manifest recording the shard count and
        sizes, so :meth:`load` is self-describing."""
        import json
        for k, s in enumerate(self.shards):
            s.write(f"{prefix}.shard{k}")
        with open(prefix + ".shards", "w") as fh:
            json.dump({
                "n_shards": self.n_shards,
                "shard_bp": [s.l_pac for s in self.shards],
                "first_rid": self.first_rid,
            }, fh)

    @classmethod
    def load(cls, prefix: str, n_shards: int | None = None
             ) -> "ShardedFMIndex":
        """Load a sharded index.  ``n_shards`` is read from the
        ``<prefix>.shards`` manifest when omitted."""
        if n_shards is None:
            import json
            with open(prefix + ".shards") as fh:
                n_shards = int(json.load(fh)["n_shards"])
        shards = [FMIndex.load(f"{prefix}.shard{k}")
                  for k in range(n_shards)]
        first_rid, n = [], 0
        for s in shards:
            first_rid.append(n)
            n += s.num_sequences()
        return cls(shards, first_rid)
