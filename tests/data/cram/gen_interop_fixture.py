"""Generate tests/data/cram/interop_mini.cram — a CRAM 3.0 interop
fixture assembled BY HAND from the specification, independent of
seqlib_tpu.io.cram (VERDICT r2 item 8: "a fixture not produced by this
codebase").

Everything below is a from-spec reimplementation using only the
stdlib: its own ITF8/LTF8, its own MSB-first bit packer, its own
canonical-Huffman code assignment, and its own rANS 4x8 encoders —
including ORDER-1 (htscodecs rans_static layout), which the production
CramWriter cannot emit (it encodes order-0 only), so a successful
decode proves the reader follows the spec rather than a private
round-trip convention.  The encoding profile also deliberately
differs from CramWriter's: slice-level ref id (no RI series), delta
AP, Huffman BF/FN/FC/TL in the CORE bit stream, BETA CF/RL/DL and
read-name lengths, BYTE_ARRAY_LEN read names, tab-terminated
BYTE_ARRAY_STOP soft clips, raw + gzip + rANS-o0 + rANS-o1 block
compression mix.

Run:  python tests/data/cram/gen_interop_fixture.py
"""

import os
import struct
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "interop_mini.cram")

TOTFREQ = 4096
L = 1 << 23


# --- varints (CRAM spec section 2.3) ---------------------------------------

def itf8(v: int) -> bytes:
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


def ltf8(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    raise NotImplementedError("fixture only needs small LTF8")


# --- MSB-first bit packer ---------------------------------------------------

class Bits:
    def __init__(self):
        self.buf = bytearray()
        self.n = 0

    def put(self, v: int, nbits: int):
        for k in range(nbits - 1, -1, -1):
            if self.n % 8 == 0:
                self.buf.append(0)
            if (v >> k) & 1:
                self.buf[-1] |= 1 << (7 - self.n % 8)
            self.n += 1

    def bytes(self) -> bytes:
        return bytes(self.buf)


# --- canonical Huffman (CRAM spec section 13.6) ----------------------------

def huffman_codes(symbols, lengths):
    pairs = sorted(zip(lengths, symbols))
    codes = {}
    code, prev = 0, 0
    for ln, sym in pairs:
        code <<= (ln - prev)
        codes[sym] = (code, ln)
        code += 1
        prev = ln
    return codes


# --- rANS 4x8 (htscodecs rans_static layout) -------------------------------

def _norm(hist: dict[int, int]) -> dict[int, int]:
    tot = sum(hist.values())
    out, acc, last = {}, 0, None
    for s in sorted(hist):
        f = max(1, hist[s] * TOTFREQ // tot)
        out[s] = f
        acc += f
        last = s
    out[last] += TOTFREQ - acc
    if out[last] <= 0:
        big = max(out, key=out.get)
        out[big] += out[last] - 1
        out[last] = 1
    return out


def _freq_bytes(freqs: dict[int, int], emit_payload) -> bytes:
    """Symbol-indexed RLE table (shared layout for the order-0 symbol
    table and the order-1 context table; `emit_payload(sym)` returns
    the per-index payload bytes: a 1-2 byte frequency, or a whole
    nested order-0 table)."""
    syms = sorted(freqs)
    out = bytearray([syms[0]])
    k, rle = 0, 0
    while True:
        out += emit_payload(syms[k])
        if rle:
            rle -= 1
            k += 1
            continue
        if k + 1 < len(syms):
            nj = syms[k + 1]
            out.append(nj)
            if nj == syms[k] + 1:
                run = 0
                while (k + 2 + run < len(syms)
                       and syms[k + 2 + run] == nj + 1 + run):
                    run += 1
                out.append(run)
                rle = run
            k += 1
        else:
            out.append(0)
            return bytes(out)


def _f12(f: int) -> bytes:
    return bytes([f]) if f < 128 else bytes([128 | (f >> 8), f & 0xFF])


def _cumulative(freqs):
    C, acc = {}, 0
    for s in sorted(freqs):
        C[s] = acc
        acc += freqs[s]
    return C


def rans_o0(data: bytes) -> bytes:
    hist = {}
    for b in data:
        hist[b] = hist.get(b, 0) + 1
    freqs = _norm(hist)
    C = _cumulative(freqs)
    table = _freq_bytes(freqs, lambda s: _f12(freqs[s]))
    states = [L, L, L, L]
    emitted = bytearray()
    for i in range(len(data) - 1, -1, -1):
        si = i & 3
        s = data[i]
        f = freqs[s]
        x = states[si]
        x_max = ((L >> 12) << 8) * f
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        states[si] = ((x // f) << 12) + (x % f) + C[s]
    head = b"".join(struct.pack("<I", states[i]) for i in range(4))
    comp = table + head + bytes(reversed(emitted))
    return b"\x00" + struct.pack("<II", len(comp), len(data)) + comp


def rans_o1(data: bytes) -> bytes:
    n = len(data)
    if n < 4:
        # order-1 needs >= 1 byte per interleaved quarter (htscodecs
        # likewise refuses tiny inputs); callers fall back to order-0
        raise ValueError("rans_o1 requires at least 4 input bytes; "
                         "use rans_o0 for tiny buffers")
    nq = n >> 2
    # decode visitation order and per-position context
    order = []
    for k in range(nq):
        for si in range(4):
            order.append((si, si * nq + k))
    for pos in range(4 * nq, n):
        order.append((3, pos))
    ctx = [0] * n
    for pos in range(n):
        ctx[pos] = 0 if pos % nq == 0 and pos // nq < 4 and pos < 4 * nq \
            else data[pos - 1]
    for si in range(4):          # quarter starts use initial context 0
        ctx[si * nq] = 0
    hists: dict[int, dict[int, int]] = {}
    for pos in range(n):
        hists.setdefault(ctx[pos], {})
        h = hists[ctx[pos]]
        h[data[pos]] = h.get(data[pos], 0) + 1
    freqs = {c: _norm(h) for c, h in hists.items()}
    cums = {c: _cumulative(f) for c, f in freqs.items()}
    tables = _freq_bytes({c: 1 for c in freqs},
                         lambda c: _freq_bytes(freqs[c],
                                               lambda s: _f12(freqs[c][s])))
    states = [L, L, L, L]
    emitted = bytearray()
    for si, pos in reversed(order):
        s = data[pos]
        f = freqs[ctx[pos]][s]
        c = cums[ctx[pos]][s]
        x = states[si]
        x_max = ((L >> 12) << 8) * f
        while x >= x_max:
            emitted.append(x & 0xFF)
            x >>= 8
        states[si] = ((x // f) << 12) + (x % f) + c
    head = b"".join(struct.pack("<I", states[i]) for i in range(4))
    comp = tables + head + bytes(reversed(emitted))
    return b"\x01" + struct.pack("<II", len(comp), n) + comp


# --- container / block assembly (spec sections 6-8) ------------------------

RAW, GZIP, RANS = 0, 1, 4
FILE_HDR, COMP_HDR, SLICE_HDR, EXT, CORE_T = 0, 1, 2, 4, 5


def block(method: int, ctype: int, cid: int, raw: bytes,
          pre_compressed: bytes | None = None) -> bytes:
    data = pre_compressed if pre_compressed is not None else (
        zlib.compress(raw, 6) if method == GZIP else raw)
    out = bytes([method, ctype]) + itf8(cid) + itf8(len(data)) \
        + itf8(len(raw)) + data
    return out + struct.pack("<I", zlib.crc32(out) & 0xFFFFFFFF)


def container(blocks: list[bytes], ref_id: int, start: int, span: int,
              n_rec: int, counter: int, bases: int) -> bytes:
    body = b"".join(blocks)
    lm, pos = [], 0
    for b in blocks:
        lm.append(pos)
        pos += len(b)
    hdr = (itf8(ref_id & 0xFFFFFFFF) + itf8(start) + itf8(span)
           + itf8(n_rec) + ltf8(counter) + ltf8(bases)
           + itf8(len(blocks)) + itf8(len(lm))
           + b"".join(itf8(x) for x in lm))
    hdr = struct.pack("<i", len(body)) + hdr
    return hdr + struct.pack("<I", zlib.crc32(hdr) & 0xFFFFFFFF) + body


def cmap(entries) -> bytes:
    body = b"".join(k + v for k, v in entries)
    inner = itf8(len(entries)) + body
    return itf8(len(inner)) + inner


def enc(codec_id: int, params: bytes) -> bytes:
    return itf8(codec_id) + itf8(len(params)) + params


# external content ids (arbitrary, unlike the production writer's)
AP_ID, RNV_ID, FP_ID, MQ_ID, SC_ID = 110, 111, 112, 113, 114
BBL_ID, BB_ID, BA_ID, QS_ID = 115, 116, 117, 118
XT_KEY = (ord("X") << 16) | (ord("T") << 8) | ord("A")

EOF = bytes.fromhex("0f000000ffffffff0fe0454f4600000000010005bdd94f"
                    "0001000606" "01000100010000ee63014b")


def main():
    # ---- encoding profile -------------------------------------------------
    bf_codes = huffman_codes([0, 4, 16], [1, 2, 2])
    fn_codes = huffman_codes([1, 2], [1, 1])
    fc_codes = huffman_codes([ord("b"), ord("D"), ord("S")], [1, 2, 2])
    tl_codes = huffman_codes([0, 1], [1, 1])

    def huff_params(symbols, lengths):
        return (itf8(len(symbols)) + b"".join(itf8(s) for s in symbols)
                + itf8(len(lengths)) + b"".join(itf8(x) for x in lengths))

    series = [
        (b"BF", enc(3, huff_params([0, 4, 16], [1, 2, 2]))),
        (b"CF", enc(6, itf8(0) + itf8(1))),              # BETA 1 bit
        (b"RL", enc(6, itf8(0) + itf8(4))),              # BETA 4 bits
        (b"AP", enc(1, itf8(AP_ID))),
        (b"RN", enc(4, enc(6, itf8(0) + itf8(3))         # len BETA 3
                    + enc(1, itf8(RNV_ID)))),
        (b"TL", enc(3, huff_params([0, 1], [1, 1]))),
        (b"FN", enc(3, huff_params([1, 2], [1, 1]))),
        (b"FC", enc(3, huff_params([ord("b"), ord("D"), ord("S")],
                                   [1, 2, 2]))),
        (b"FP", enc(1, itf8(FP_ID))),
        (b"BS", enc(3, huff_params([0], [0]))),          # const 0
        (b"DL", enc(6, itf8(0) + itf8(3))),              # BETA 3 bits
        (b"MQ", enc(1, itf8(MQ_ID))),
        (b"SC", enc(5, bytes([ord("\t")]) + itf8(SC_ID))),
        (b"BB", enc(4, enc(1, itf8(BBL_ID)) + enc(1, itf8(BB_ID)))),
        (b"BA", enc(1, itf8(BA_ID))),
        (b"QS", enc(1, itf8(QS_ID))),
    ]
    td = b"\x00" + b"XTA\x00"                            # line0 empty, line1 XT:A
    pres = [(b"RN", b"\x01"), (b"AP", b"\x01"), (b"RR", b"\x00"),
            (b"SM", bytes([0x1B] * 5)), (b"TD", itf8(len(td)) + td)]
    tags = [(itf8(XT_KEY), enc(4, enc(3, huff_params([1], [0]))
                               + enc(1, itf8(XT_KEY))))]
    comp_hdr = cmap(pres) + cmap(series) + cmap(tags)

    # ---- core bit stream (decode order, record by record) -----------------
    core = Bits()

    def hput(codes, sym):
        c, ln = codes[sym]
        core.put(c, ln)

    # rec1: flag 0, rl 8, name len 4, TL 1, FN 1, feature 'b'
    hput(bf_codes, 0); core.put(1, 1); core.put(8, 4); core.put(4, 3)
    hput(tl_codes, 1); hput(fn_codes, 1); hput(fc_codes, ord("b"))
    # rec2: flag 16, rl 10, name len 4, TL 0, FN 2, 'S' then 'D'(DL 3)
    hput(bf_codes, 16); core.put(1, 1); core.put(10, 4); core.put(4, 3)
    hput(tl_codes, 0); hput(fn_codes, 2)
    hput(fc_codes, ord("S")); hput(fc_codes, ord("D")); core.put(3, 3)
    # rec3: flag 4 (unmapped), rl 6, name len 4, TL 0
    hput(bf_codes, 4); core.put(1, 1); core.put(6, 4); core.put(4, 3)
    hput(tl_codes, 0)

    # ---- external streams -------------------------------------------------
    ap = itf8(0) + itf8(50) + itf8(5)                    # deltas: 100,150,155
    rn = b"fix1fix2fix3"
    fp = itf8(1) + itf8(1) + itf8(5)
    mq = itf8(37) + itf8(23)
    sc = b"TT\t"
    bbl = itf8(8)
    bb = b"ACGTACGT"
    ba = b"ACACAC"
    qs = bytes([30] * 8 + [25] * 10 + [20] * 6)
    xt = b"U"

    cids = [AP_ID, RNV_ID, FP_ID, MQ_ID, SC_ID, BBL_ID, BB_ID,
            BA_ID, QS_ID, XT_KEY]
    # slice start 101 = 1-based position 101 -> first record pos0 100
    slice_hdr = (itf8(0) + itf8(101) + itf8(60) + itf8(3) + ltf8(0)
                 + itf8(len(cids)) + b"".join(itf8(c) for c in cids)
                 + itf8(0xFFFFFFFF) + b"\x00" * 16)

    blocks = [
        block(GZIP, COMP_HDR, 0, comp_hdr),
        block(RAW, SLICE_HDR, 0, slice_hdr),
        block(RAW, CORE_T, 0, core.bytes()),
        block(GZIP, EXT, AP_ID, ap),
        block(RAW, EXT, RNV_ID, rn),
        block(RAW, EXT, FP_ID, fp),
        block(RAW, EXT, MQ_ID, mq),
        block(RAW, EXT, SC_ID, sc),
        block(RAW, EXT, BBL_ID, bbl),
        block(RANS, EXT, BB_ID, bb, pre_compressed=rans_o0(bb)),
        block(RAW, EXT, BA_ID, ba),
        block(RANS, EXT, QS_ID, qs, pre_compressed=rans_o1(qs)),
        block(RAW, EXT, XT_KEY, xt),
    ]

    sam_hdr = ("@HD\tVN:1.6\tSO:unsorted\n"
               "@SQ\tSN:chr1\tLN:1000\n").encode()
    hdr_block = block(RAW, FILE_HDR, 0,
                      struct.pack("<i", len(sam_hdr)) + sam_hdr)

    with open(OUT, "wb") as f:
        f.write(b"CRAM\x03\x00" + b"interop-fixture".ljust(20, b"\x00"))
        f.write(container([hdr_block], -1, 0, 0, 0, 0, 0))
        f.write(container(blocks, 0, 101, 60, 3, 0, 24))
        f.write(EOF)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


# ---------------------------------------------------------------------------
# RR=1 (reference-based) fixtures: embedded- and external-reference
# variants.  Matching bases are IMPLICIT (not stored anywhere in the
# file), substitutions are X features with BS codes under a
# NON-default substitution matrix — the profile htslib emits by
# default and the production CramWriter's RR=0 path never produces.
# ---------------------------------------------------------------------------

# chr1[100:160] (0-based); the full chr1 is N*100 + RR1_SEG + N-pad
RR1_SEG = "ACGTTGCAACGTGGATCCTAGGCATCGATCGGATTACAGGCATGCATCGTACGTACGTA"
# custom SM: per reference base (ACGTN order), 2-bit codes for the 4
# alternative bases in ACGTN-minus-ref order, first alt in bits 7..6
RR1_SM = bytes([0x93,    # A: C=2 G=1 T=0 N=3
                0x1B,    # C: A=0 G=1 T=2 N=3
                0xE4,    # G: A=3 C=2 T=1 N=0
                0x4B,    # T: A=1 C=0 G=2 N=3
                0x1B])   # N: A=0 C=1 G=2 T=3
RR1_EMB_ID = 200


def gen_rr1(embedded: bool, out_path: str) -> None:
    ap_id, rnv_id, fp_id, bs_id, mq_id, sc_id = 110, 111, 112, 113, \
        114, 115

    def huff_params(symbols, lengths):
        return (itf8(len(symbols)) + b"".join(itf8(s) for s in symbols)
                + itf8(len(lengths)) + b"".join(itf8(x) for x in lengths))

    series = [
        (b"BF", enc(3, huff_params([0], [0]))),          # const 0
        (b"CF", enc(3, huff_params([0], [0]))),          # const 0
        (b"RL", enc(6, itf8(0) + itf8(4))),              # BETA 4 bits
        (b"AP", enc(1, itf8(ap_id))),
        (b"RN", enc(4, enc(6, itf8(0) + itf8(3))
                    + enc(1, itf8(rnv_id)))),
        (b"TL", enc(3, huff_params([0], [0]))),          # const 0
        (b"FN", enc(3, huff_params([0, 2, 3], [1, 2, 2]))),
        (b"FC", enc(3, huff_params([ord("X"), ord("S"), ord("D")],
                                   [1, 2, 2]))),
        (b"FP", enc(1, itf8(fp_id))),
        (b"BS", enc(1, itf8(bs_id))),
        (b"DL", enc(6, itf8(0) + itf8(3))),              # BETA 3 bits
        (b"MQ", enc(1, itf8(mq_id))),
        (b"SC", enc(5, bytes([0]) + itf8(sc_id))),
    ]
    td = b"\x00"                                         # line0: no tags
    pres = [(b"RN", b"\x01"), (b"AP", b"\x01"), (b"RR", b"\x01"),
            (b"SM", RR1_SM), (b"TD", itf8(len(td)) + td)]
    comp_hdr = cmap(pres) + cmap(series) + cmap([])

    fn_codes = huffman_codes([0, 2, 3], [1, 2, 2])
    fc_codes = huffman_codes([ord("X"), ord("S"), ord("D")], [1, 2, 2])
    core = Bits()

    def hput(codes, sym):
        c, ln = codes[sym]
        core.put(c, ln)

    # rec1 rr1a: ap 101, 12M with X@4 (code 0 on ref T -> C) and
    # X@9 (code 1 on ref A -> G)
    core.put(12, 4); core.put(4, 3)
    hput(fn_codes, 2)
    hput(fc_codes, ord("X")); hput(fc_codes, ord("X"))
    # rec2 rr1b: ap 131, 2S5M3D3M with X@5 (code 0 on ref A -> T)
    core.put(10, 4); core.put(4, 3)
    hput(fn_codes, 3)
    hput(fc_codes, ord("S")); hput(fc_codes, ord("X"))
    hput(fc_codes, ord("D")); core.put(3, 3)
    # rec3 rr1c: ap 141, 8M fully implicit (no base data in the file)
    core.put(8, 4); core.put(4, 3)
    hput(fn_codes, 0)

    ap = itf8(0) + itf8(30) + itf8(10)
    rn = b"rr1arr1brr1c"
    fp = itf8(4) + itf8(5) + itf8(1) + itf8(4) + itf8(3)
    bs = itf8(0) + itf8(1) + itf8(0)
    mq = itf8(60) + itf8(33) + itf8(7)
    sc = b"GT\x00"

    cids = [ap_id, rnv_id, fp_id, bs_id, mq_id, sc_id]
    if embedded:
        cids.append(RR1_EMB_ID)
    slice_hdr = (itf8(0) + itf8(101) + itf8(60) + itf8(3) + ltf8(0)
                 + itf8(len(cids)) + b"".join(itf8(c) for c in cids)
                 + itf8(RR1_EMB_ID if embedded else 0xFFFFFFFF)
                 + b"\x00" * 16)

    blocks = [
        block(GZIP, COMP_HDR, 0, comp_hdr),
        block(RAW, SLICE_HDR, 0, slice_hdr),
        block(RAW, CORE_T, 0, core.bytes()),
        block(GZIP, EXT, ap_id, ap),
        block(RAW, EXT, rnv_id, rn),
        block(RAW, EXT, fp_id, fp),
        block(RAW, EXT, bs_id, bs),
        block(RAW, EXT, mq_id, mq),
        block(RAW, EXT, sc_id, sc),
    ]
    if embedded:
        blocks.append(block(RANS, EXT, RR1_EMB_ID, RR1_SEG.encode(),
                            pre_compressed=rans_o0(RR1_SEG.encode())))

    sam_hdr = ("@HD\tVN:1.6\tSO:unsorted\n"
               "@SQ\tSN:chr1\tLN:1000\n").encode()
    hdr_block = block(RAW, FILE_HDR, 0,
                      struct.pack("<i", len(sam_hdr)) + sam_hdr)
    with open(out_path, "wb") as f:
        f.write(b"CRAM\x03\x00" + b"rr1-fixture".ljust(20, b"\x00"))
        f.write(container([hdr_block], -1, 0, 0, 0, 0, 0))
        f.write(container(blocks, 0, 101, 60, 3, 0, 30))
        f.write(EOF)
    print(f"wrote {out_path} ({os.path.getsize(out_path)} bytes)")


def gen_multicontainer(out_path: str) -> None:
    """Multi-container fixture + hand-computed .crai for region-query
    testing: four single-ref containers (three on chr1 at distinct
    coordinate windows, one on chr2), each with its own slice
    ref/start/span, plus the spec-appendix .crai (gzip TSV of
    ref_id, start, span, container offset, slice landmark, slice
    size).  Records are mapped, feature-free (FN=0, bases implicit —
    RR=0 so they decode as N), CF=0 (no quals): the queryable fields
    are qname/tid/pos/read-length."""
    ap_id, rnv_id, mq_id = 120, 121, 122

    def huff_params(symbols, lengths):
        return (itf8(len(symbols)) + b"".join(itf8(s) for s in symbols)
                + itf8(len(lengths)) + b"".join(itf8(x) for x in lengths))

    series = [
        (b"BF", enc(3, huff_params([0], [0]))),          # const 0
        (b"CF", enc(3, huff_params([0], [0]))),          # const 0
        (b"RL", enc(6, itf8(0) + itf8(6))),              # BETA 6 bits
        (b"AP", enc(1, itf8(ap_id))),
        (b"RN", enc(4, enc(6, itf8(0) + itf8(4))
                    + enc(1, itf8(rnv_id)))),
        (b"TL", enc(3, huff_params([0], [0]))),
        (b"FN", enc(3, huff_params([0], [0]))),          # no features
        (b"MQ", enc(1, itf8(mq_id))),
    ]
    td = b"\x00"
    pres = [(b"RN", b"\x01"), (b"AP", b"\x00"), (b"RR", b"\x00"),
            (b"TD", itf8(len(td)) + td)]
    comp_hdr = cmap(pres) + cmap(series) + cmap([])

    # (ref_id, [(name4, pos1, read_len)]) per container
    spec = [
        (0, [("c0r0", 101, 50), ("c0r1", 161, 50), ("c0r2", 221, 50)]),
        (0, [("c1r0", 501, 50), ("c1r1", 571, 50)]),
        (0, [("c2r0", 901, 50), ("c2r1", 931, 50), ("c2r2", 961, 50)]),
        (1, [("c3r0", 51, 50), ("c3r1", 401, 50)]),
    ]
    sam_hdr = ("@HD\tVN:1.6\tSO:coordinate\n"
               "@SQ\tSN:chr1\tLN:2000\n"
               "@SQ\tSN:chr2\tLN:1000\n").encode()
    hdr_block = block(RAW, FILE_HDR, 0,
                      struct.pack("<i", len(sam_hdr)) + sam_hdr)
    crai = []
    with open(out_path, "wb") as f:
        f.write(b"CRAM\x03\x00" + b"multi-fixture".ljust(20, b"\x00"))
        offset = 26
        hc = container([hdr_block], -1, 0, 0, 0, 0, 0)
        f.write(hc)
        offset += len(hc)
        counter = 0
        for ref_id, recs in spec:
            core = Bits()
            for _name, _pos, rl in recs:
                core.put(rl, 6)          # RL (BETA 6 bits)
                core.put(4, 4)           # RN length (BETA 4 bits)
            ap = b"".join(itf8(p) for _n, p, _l in recs)
            rn = "".join(n for n, _p, _l in recs).encode()
            mq = b"".join(itf8(42) for _ in recs)
            start = min(p for _n, p, _l in recs)
            span = max(p + _l for _n, p, _l in recs) - start
            cids = [ap_id, rnv_id, mq_id]
            slice_hdr = (itf8(ref_id) + itf8(start) + itf8(span)
                         + itf8(len(recs)) + ltf8(counter)
                         + itf8(len(cids))
                         + b"".join(itf8(c) for c in cids)
                         + itf8(0xFFFFFFFF) + b"\x00" * 16)
            blocks = [
                block(GZIP, COMP_HDR, 0, comp_hdr),
                block(RAW, SLICE_HDR, 0, slice_hdr),
                block(RAW, CORE_T, 0, core.bytes()),
                block(GZIP, EXT, ap_id, ap),
                block(RAW, EXT, rnv_id, rn),
                block(RAW, EXT, mq_id, mq),
            ]
            crai.append((ref_id, start, span, offset, len(blocks[0]),
                         sum(len(b) for b in blocks[1:])))
            c = container(blocks, ref_id, start, span, len(recs),
                          counter, sum(_l for _n, _p, _l in recs))
            f.write(c)
            offset += len(c)
            counter += len(recs)
        f.write(EOF)
    import gzip
    with gzip.open(out_path + ".crai", "wb") as fh:
        for e in crai:
            fh.write(("\t".join(str(x) for x in e) + "\n").encode())
    print(f"wrote {out_path} ({os.path.getsize(out_path)} bytes) "
          f"+ .crai ({len(crai)} slices)")


if __name__ == "__main__":
    main()
    gen_rr1(True, os.path.join(HERE, "interop_rr1_embed.cram"))
    gen_rr1(False, os.path.join(HERE, "interop_rr1_ext.cram"))
    gen_multicontainer(os.path.join(HERE, "interop_multi.cram"))
