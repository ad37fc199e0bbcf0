"""CRAM 3.0 container I/O (subset profile).

Replaces the reference's CRAM capability (HTSlib cram codec, used via
``BamWriter(SeqLib::CRAM)`` /root/reference/src/BamWriter.cpp:133-167).

Implemented per the CRAM 3.0 container model: file definition, ITF8/
LTF8 varints, containers with landmarks + CRC32, blocks with
method/content-type/content-id and gzip compression, SAM-header
container, and the canonical EOF container.  The record codec is a
simplified profile: each data series (flags, positions, names, bases,
quals, tags) is a dedicated EXTERNAL block, byte-aligned — readable by
this library; full htslib-interoperable read-feature encoding is
roadmap (docs/ROADMAP.md).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..core.cigar import Cigar
from ..core.header import BamHeader
from ..core.record import BamRecord

CRAM_MAGIC = b"CRAM\x03\x00"

# canonical CRAM 3.0 EOF container (spec section 9)
CRAM_EOF = bytes.fromhex(
    "0f000000ffffffff0fe045" "4f4600000000010005bdd94f" "0001000606"
    "01000100010000ee63014b")


# ---------------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------------

def write_itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF,
                      (v >> 8) & 0xFF, v & 0xFF])
    return bytes([0xF0 | ((v >> 28) & 0x0F), (v >> 20) & 0xFF,
                  (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F])


def read_itf8(buf: bytes, off: int) -> tuple[int, int]:
    b0 = buf[off]
    if b0 < 0x80:
        return b0, off + 1
    if b0 < 0xC0:
        return ((b0 & 0x7F) << 8) | buf[off + 1], off + 2
    if b0 < 0xE0:
        return ((b0 & 0x3F) << 16) | (buf[off + 1] << 8) | buf[off + 2], \
            off + 3
    if b0 < 0xF0:
        return ((b0 & 0x1F) << 24) | (buf[off + 1] << 16) \
            | (buf[off + 2] << 8) | buf[off + 3], off + 4
    v = ((b0 & 0x0F) << 28) | (buf[off + 1] << 20) | (buf[off + 2] << 12) \
        | (buf[off + 3] << 4) | (buf[off + 4] & 0x0F)
    return v, off + 5


def write_ltf8(v: int) -> bytes:
    v &= 0xFFFFFFFFFFFFFFFF
    if v < 0x80:
        return bytes([v])
    n = 1
    while v >= (1 << (7 * n + 8 * 0)) and n < 8:
        n += 1
    # encode with n leading 1-bits
    for k in range(1, 9):
        if v < (1 << (7 - k + 8 * k)) or k == 8:
            prefix = (0xFF << (8 - k)) & 0xFF
            body = v.to_bytes(k + 1, "big") if k < 8 \
                else v.to_bytes(8, "big")
            if k < 8:
                first = prefix | body[0]
                if k < 7 and body[0] >= (1 << (7 - k)):
                    continue
                return bytes([first]) + body[1:]
            return bytes([0xFF]) + body
    raise AssertionError


def read_ltf8(buf: bytes, off: int) -> tuple[int, int]:
    b0 = buf[off]
    k = 0
    while k < 8 and (b0 << k) & 0x80:
        k += 1
    if k == 0:
        return b0, off + 1
    if k == 8:
        return int.from_bytes(buf[off + 1:off + 9], "big"), off + 9
    v = b0 & (0x7F >> k)
    for i in range(k):
        v = (v << 8) | buf[off + 1 + i]
    return v, off + 1 + k


# ---------------------------------------------------------------------------
# blocks / containers
# ---------------------------------------------------------------------------

RAW, GZIP = 0, 1
FILE_HEADER, COMPRESSION_HEADER, SLICE_HEADER, EXTERNAL = 0, 1, 2, 4


def write_block(method: int, ctype: int, content_id: int,
                data: bytes) -> bytes:
    raw_size = len(data)
    if method == GZIP:
        data = zlib.compress(data, 6)
    out = bytes([method, ctype]) + write_itf8(content_id) \
        + write_itf8(len(data)) + write_itf8(raw_size) + data
    return out + struct.pack("<I", zlib.crc32(out) & 0xFFFFFFFF)


def read_block(buf: bytes, off: int):
    start = off
    method, ctype = buf[off], buf[off + 1]
    off += 2
    content_id, off = read_itf8(buf, off)
    csize, off = read_itf8(buf, off)
    rsize, off = read_itf8(buf, off)
    data = buf[off:off + csize]
    off += csize
    crc = struct.unpack_from("<I", buf, off)[0]
    if crc != zlib.crc32(buf[start:off]) & 0xFFFFFFFF:
        raise ValueError("CRAM: block CRC mismatch")
    off += 4
    if method == GZIP:
        data = zlib.decompress(data)
    if len(data) != rsize:
        raise ValueError("CRAM: block size mismatch")
    return dict(method=method, ctype=ctype, content_id=content_id,
                data=data), off


def write_container(blocks: list[bytes], ref_id: int = -2, start: int = 0,
                    span: int = 0, n_records: int = 0,
                    counter: int = 0, bases: int = 0) -> bytes:
    body = b"".join(blocks)
    landmarks = []
    pos = 0
    for b in blocks:
        landmarks.append(pos)
        pos += len(b)
    hdr = (write_itf8(ref_id & 0xFFFFFFFF) + write_itf8(start)
           + write_itf8(span) + write_itf8(n_records)
           + write_ltf8(counter) + write_ltf8(bases)
           + write_itf8(len(blocks)) + write_itf8(len(landmarks))
           + b"".join(write_itf8(l) for l in landmarks))
    hdr_with_len = struct.pack("<i", len(body)) + hdr
    crc = zlib.crc32(hdr_with_len) & 0xFFFFFFFF
    return hdr_with_len + struct.pack("<I", crc) + body


def read_container_header(fh):
    raw = fh.read(4)
    if len(raw) < 4:
        return None
    (length,) = struct.unpack("<i", raw)
    # read varint fields byte-wise
    rest = fh.read(64)  # enough for the header fields
    buf = raw + rest
    off = 4
    ref_id, off = read_itf8(buf, off)
    start, off = read_itf8(buf, off)
    span, off = read_itf8(buf, off)
    n_records, off = read_itf8(buf, off)
    counter, off = read_ltf8(buf, off)
    bases, off = read_ltf8(buf, off)
    n_blocks, off = read_itf8(buf, off)
    n_land, off = read_itf8(buf, off)
    landmarks = []
    for _ in range(n_land):
        if off + 5 > len(buf):
            buf += fh.read(64)
        v, off = read_itf8(buf, off)
        landmarks.append(v)
    off += 4  # crc
    # rewind extra bytes
    fh.seek(off - len(buf), 1)
    if ref_id >= 0x80000000:
        ref_id -= 0x100000000
    return dict(length=length, ref_id=ref_id, start=start, span=span,
                n_records=n_records, counter=counter, bases=bases,
                n_blocks=n_blocks)


# ---------------------------------------------------------------------------
# record series codec (subset profile)
# ---------------------------------------------------------------------------

_SERIES = ["BF", "MQ", "RI", "AP", "RL", "RN", "CG", "SQ", "QS", "NS",
           "NP", "TS", "TG"]
_SERIES_ID = {s: i + 1 for i, s in enumerate(_SERIES)}


def _encode_records(recs: list[BamRecord]) -> list[bytes]:
    cols = {s: bytearray() for s in _SERIES}
    for r in recs:
        cols["BF"] += write_itf8(r.flag)
        cols["MQ"] += write_itf8(r.mapq)
        cols["RI"] += write_itf8(r.tid & 0xFFFFFFFF)
        cols["AP"] += write_itf8(r.pos & 0xFFFFFFFF)
        cols["RL"] += write_itf8(len(r.seq))
        cols["RN"] += r.qname.encode() + b"\x00"
        cols["CG"] += str(r.cigar).encode() + b"\x00"
        cols["SQ"] += r.seq.encode()
        if r.qual is None:
            cols["QS"] += b"\xff"
        else:
            cols["QS"] += b"\x01" + r.qual.astype(np.uint8).tobytes()
        cols["NS"] += write_itf8(r.mtid & 0xFFFFFFFF)
        cols["NP"] += write_itf8(r.mpos & 0xFFFFFFFF)
        cols["TS"] += write_itf8(r.isize & 0xFFFFFFFF)
        cols["TG"] += ("\t".join(
            f"{t}:{ty}:{v}" for t, (ty, v) in r.tags.items()
            if ty not in "B") .encode()) + b"\x00"
    return [write_block(GZIP, EXTERNAL, _SERIES_ID[s], bytes(cols[s]))
            for s in _SERIES]


def _u2i(v: int) -> int:
    return v - 0x100000000 if v >= 0x80000000 else v


def _decode_records(blocks: dict[int, bytes], n: int,
                    hdr: BamHeader) -> list[BamRecord]:
    offs = {s: 0 for s in _SERIES}
    bufs = {s: blocks.get(_SERIES_ID[s], b"") for s in _SERIES}

    def itf(s):
        v, offs[s] = read_itf8(bufs[s], offs[s])
        return v

    def cstr(s):
        end = bufs[s].index(b"\x00", offs[s])
        out = bufs[s][offs[s]:end].decode()
        offs[s] = end + 1
        return out

    recs = []
    for _ in range(n):
        r = BamRecord()
        r.flag = itf("BF")
        r.mapq = itf("MQ")
        r.tid = _u2i(itf("RI"))
        r.pos = _u2i(itf("AP"))
        rl = itf("RL")
        r.qname = cstr("RN")
        r.cigar = Cigar(cstr("CG"))
        r.seq = bufs["SQ"][offs["SQ"]:offs["SQ"] + rl].decode()
        offs["SQ"] += rl
        marker = bufs["QS"][offs["QS"]]
        offs["QS"] += 1
        if marker == 0xFF:
            r.qual = None
        else:
            r.qual = np.frombuffer(
                bufs["QS"], np.uint8, rl, offs["QS"]).copy()
            offs["QS"] += rl
        r.mtid = _u2i(itf("NS"))
        r.mpos = _u2i(itf("NP"))
        r.isize = _u2i(itf("TS"))
        tg = cstr("TG")
        if tg:
            for f in tg.split("\t"):
                tag, ty, val = f.split(":", 2)
                if ty in "iIcCsS":
                    r.tags[tag] = (ty, int(val))
                elif ty == "f":
                    r.tags[tag] = ("f", float(val))
                else:
                    r.tags[tag] = (ty, val)
        recs.append(r)
    return recs


# ---------------------------------------------------------------------------
# reader / writer
# ---------------------------------------------------------------------------

class CramWriter:
    RECORDS_PER_CONTAINER = 10000

    def __init__(self, path_or_fileobj):
        if hasattr(path_or_fileobj, "write"):
            self._fh = path_or_fileobj
            self._owns = False
        else:
            self._fh = open(path_or_fileobj, "wb")
            self._owns = True
        self._fh.write(CRAM_MAGIC + b"seqlib_tpu".ljust(20, b"\x00"))
        self._pending: list[BamRecord] = []
        self._counter = 0
        self._header_written = False

    def write_header(self, hdr: BamHeader) -> None:
        text = hdr.as_string().encode()
        blk = write_block(GZIP, FILE_HEADER, 0,
                          struct.pack("<i", len(text)) + text)
        self._fh.write(write_container([blk], ref_id=-1))
        self._header_written = True

    def write_record(self, rec: BamRecord) -> None:
        self._pending.append(rec)
        if len(self._pending) >= self.RECORDS_PER_CONTAINER:
            self._flush()

    def _flush(self) -> None:
        if not self._pending:
            return
        recs = self._pending
        # compression-header block: a minimal preservation map
        comp = write_block(GZIP, COMPRESSION_HEADER, 0,
                           b"\x00")  # subset profile: no maps
        blocks = [comp] + _encode_records(recs)
        tids = {r.tid for r in recs}
        ref_id = tids.pop() if len(tids) == 1 else -2
        self._fh.write(write_container(
            blocks, ref_id=ref_id, n_records=len(recs),
            counter=self._counter,
            bases=sum(len(r.seq) for r in recs)))
        self._counter += len(recs)
        self._pending = []

    def close(self) -> None:
        self._flush()
        self._fh.write(CRAM_EOF)
        if self._owns:
            self._fh.close()


class CramReader:
    def __init__(self, path_or_fileobj):
        if hasattr(path_or_fileobj, "read"):
            self._fh = path_or_fileobj
        else:
            self._fh = open(path_or_fileobj, "rb")
        magic = self._fh.read(6)
        if magic != CRAM_MAGIC:
            raise ValueError("not a CRAM 3.0 file")
        self._fh.read(20)  # file id
        self.header = self._read_header_container()
        self._queue: list[BamRecord] = []
        self._eof = False

    def _read_header_container(self) -> BamHeader:
        ch = read_container_header(self._fh)
        body = self._fh.read(ch["length"])
        blk, _ = read_block(body, 0)
        (l_text,) = struct.unpack_from("<i", blk["data"], 0)
        return BamHeader(blk["data"][4:4 + l_text].decode())

    def next(self) -> BamRecord | None:
        while not self._queue and not self._eof:
            ch = read_container_header(self._fh)
            if ch is None or ch["ref_id"] == -1 and ch["n_records"] == 0 \
                    and ch["length"] <= 15:
                self._eof = True
                break
            body = self._fh.read(ch["length"])
            if ch["n_records"] == 0:
                continue
            off = 0
            blocks: dict[int, bytes] = {}
            for _ in range(ch["n_blocks"]):
                blk, off = read_block(body, off)
                if blk["ctype"] == EXTERNAL:
                    blocks[blk["content_id"]] = blk["data"]
            self._queue = _decode_records(blocks, ch["n_records"],
                                          self.header)
        if self._queue:
            return self._queue.pop(0)
        return None

    def __iter__(self):
        return self

    def __next__(self):
        r = self.next()
        if r is None:
            raise StopIteration
        return r

    def close(self) -> None:
        self._fh.close()
