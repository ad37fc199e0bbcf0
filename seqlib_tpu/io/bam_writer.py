"""BamWriter: BAM/SAM writer with post-close index build.

Parity target: /root/reference/SeqLib/BamWriter.h:16-119 and
/root/reference/src/BamWriter.cpp — Open by format or extension,
SetHeader/WriteHeader/WriteRecord/Close/BuildIndex.  Format constants
mirror ``SeqLib::BAM=4 / SAM=3 / CRAM=6`` (BamWriter.h:10-12); CRAM
uses the container codec in seqlib_tpu.io.cram.
"""

from __future__ import annotations

import sys

from ..core.header import BamHeader
from ..core.record import BamRecord
from .bai import BaiIndex
from .bam import encode_record, write_bam_header
from .bgzf import BgzfWriter

SAM = 3
BAM = 4
CRAM = 6


class BamWriter:
    def __init__(self, fmt: int | None = None):
        self._fmt = fmt
        self._path: str | None = None
        self._bgzf: BgzfWriter | None = None
        self._cram = None
        self._crai_entries = None
        self._sam_fh = None
        self._header: BamHeader | None = None
        self._header_written = False
        self._index = None
        self._last_key = None

    # -- open (BamWriter.cpp:69-100) ----------------------------------------

    def open(self, path: str) -> bool:
        self._path = path
        fmt = self._fmt
        if fmt is None:
            if path.endswith(".sam") or path == "-":
                fmt = SAM
            elif path.endswith(".cram"):
                fmt = CRAM
            else:
                fmt = BAM
            self._fmt = fmt
        try:
            if fmt == SAM:
                self._sam_fh = (sys.stdout if path == "-"
                                else open(path, "w"))
            elif fmt == CRAM:
                from .cram import CramWriter
                target = sys.stdout.buffer if path == "-" else path
                self._cram = CramWriter(
                    target,
                    reference=getattr(self, "_cram_reference", None))
            else:
                target = sys.stdout.buffer if path == "-" else path
                self._bgzf = BgzfWriter(target)
            return True
        except OSError:
            return False

    def is_open(self) -> bool:
        return self._bgzf is not None or self._sam_fh is not None

    def set_cram_reference(self, fasta) -> None:
        """Attach a reference for CRAM output — switches the CRAM
        writer to the reference-based profile (RR=1), the behavior the
        reference gets from hts_set_fai_filename
        (/root/reference/src/BamWriter.cpp:133-167).  Accepts a FASTA
        path, dict name->seq, or RefGenome; call before/after Open but
        before the first flushed container."""
        self._cram_reference = fasta
        if self._cram is not None:
            self._cram.set_reference(fasta)

    # -- header (BamWriter.cpp:14-33) ---------------------------------------

    def set_header(self, hdr: BamHeader) -> None:
        self._header = hdr

    def write_header(self) -> bool:
        if self._header is None:
            raise RuntimeError(
                "BamWriter::WriteHeader - no header supplied")
        if self._fmt == SAM:
            self._sam_fh.write(self._header.as_string())
            if not self._header.as_string().endswith("\n"):
                self._sam_fh.write("\n")
        elif self._fmt == CRAM:
            self._cram.write_header(self._header)
        else:
            write_bam_header(self._bgzf, self._header)
        self._header_written = True
        return True

    # -- records (BamWriter.cpp:103-113) ------------------------------------

    def write_record(self, rec: BamRecord) -> bool:
        if not self._header_written:
            self.write_header()
        if self._fmt == SAM:
            self._sam_fh.write(rec.to_sam(self._header) + "\n")
            return True
        if self._fmt == CRAM:
            self._cram.write_record(rec)
            return True
        voff_beg = self._bgzf.tell_virtual()
        self._bgzf.write(encode_record(rec))
        voff_end = self._bgzf.tell_virtual()
        if self._index is not None:
            end = rec.pos + max(rec.cigar.num_reference_consumed(), 1)
            self._index.add_record(rec.tid, rec.pos, end, voff_beg, voff_end,
                                   rec.mapped_flag())
        return True

    def write_records_bytes(self, payload: bytes) -> bool:
        """Write pre-serialized BAM records (the aligner's native
        emission payload, align_batch_bam/align_stream_bam) straight
        through the BGZF layer with native multi-threaded deflate —
        the production fastq->BAM fast path end to end.  BAM only; not
        valid with on-the-fly indexing (records bypass the per-record
        virtual-offset bookkeeping)."""
        if self._fmt != BAM:
            raise ValueError("write_records_bytes requires BAM output")
        if self._index is not None:
            raise ValueError("write_records_bytes is incompatible "
                             "with enable_indexing")
        if not self._header_written:
            self.write_header()
        self._bgzf.write_bulk(payload)
        return True

    def enable_indexing(self) -> None:
        """Collect BAI data on the fly; Close() then writes <path>.bai.

        (Reference builds after close via sam_index_build,
        BamWriter.cpp:46-67; we index inline which avoids a re-read.)"""
        if self._header is None:
            raise RuntimeError("enable_indexing requires a header first")
        self._index = BaiIndex(self._header.num_sequences())

    def build_index(self) -> bool:
        """Build .bai (BAM) or .crai (CRAM) for the closed output —
        the reference's BuildIndex indexes whatever was written
        (BamWriter.cpp:46-67; sam_index_build picks the index kind by
        format)."""
        if self._fmt == SAM or self._path in (None, "-"):
            return False
        if self._fmt == CRAM:
            if self._crai_entries is None:
                return False
            from .cram import write_crai
            write_crai(self._path + ".crai", self._crai_entries)
            return True
        if self._index is not None:
            self._index.save(self._path + ".bai")
            return True
        # re-read the file to index it
        from .bgzf import BgzfReader
        from .bam import read_bam_header
        r = BgzfReader(self._path)
        hdr = read_bam_header(r)
        idx = BaiIndex(hdr.num_sequences())
        while True:
            voff = r.tell_virtual()
            from .bam import read_record
            rec = read_record(r)
            if rec is None:
                break
            end = rec.pos + max(rec.cigar.num_reference_consumed(), 1)
            idx.add_record(rec.tid, rec.pos, end, voff, r.tell_virtual(),
                           rec.mapped_flag())
        r.close()
        idx.save(self._path + ".bai")
        return True

    def close(self) -> bool:
        if self._fmt == SAM:
            if self._sam_fh not in (None, sys.stdout):
                self._sam_fh.close()
            self._sam_fh = None
        elif self._fmt == CRAM:
            if self._cram is not None:
                self._cram.close()
                self._crai_entries = self._cram.index_entries
                self._cram = None
        elif self._bgzf is not None:
            self._bgzf.close()
            self._bgzf = None
            if self._index is not None and self._path not in (None, "-"):
                self._index.save(self._path + ".bai")
        return True

    # reference-style aliases
    Open = open
    Close = close
    SetHeader = set_header
    WriteHeader = write_header
    WriteRecord = write_record
    BuildIndex = build_index
