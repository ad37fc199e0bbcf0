// Native BAM I/O for the seqlib_tpu host runtime (from scratch).
//
// Role: the hot byte-level work of BAM reading — BGZF inflate and
// record-field extraction into columnar arrays — runs here instead of
// per-record Python (replaces HTSlib's sam_read1 path consumed by the
// reference at /root/reference/src/BamReader.cpp:114).
//
// Build: linked into libseqlib_native.so with -lz (see seqlib_tpu/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

// decode BAM 4-bit codes to ASCII
const char NIB2ASCII[16] = {'=', 'A', 'C', 'M', 'G', 'R', 'S', 'V',
                            'T', 'W', 'Y', 'H', 'K', 'D', 'B', 'N'};

}  // namespace

extern "C" {

// Inflate a whole BGZF byte stream (concatenated gzip members) into
// `out`.  Returns total decompressed bytes, or -1 on error / overflow.
int64_t bgzf_inflate_all(const uint8_t* in, int64_t in_len,
                         uint8_t* out, int64_t out_cap) {
  int64_t ip = 0, op = 0;
  while (ip + 18 <= in_len) {
    if (in[ip] != 0x1F || in[ip + 1] != 0x8B) return -1;
    uint16_t xlen;
    std::memcpy(&xlen, in + ip + 10, 2);
    // find BSIZE in extra
    int64_t xp = ip + 12;
    int64_t xend = xp + xlen;
    int32_t bsize = -1;
    while (xp + 4 <= xend) {
      uint8_t si1 = in[xp], si2 = in[xp + 1];
      uint16_t slen;
      std::memcpy(&slen, in + xp + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t bs;
        std::memcpy(&bs, in + xp + 4, 2);
        bsize = bs + 1;
        break;
      }
      xp += 4 + slen;
    }
    if (bsize < 0 || ip + bsize > in_len) return -1;
    const uint8_t* cdata = in + xend;
    int64_t cdata_len = bsize - 12 - xlen - 8;
    uint32_t isize;
    std::memcpy(&isize, in + ip + bsize - 4, 4);
    if (op + isize > out_cap) return -1;
    if (isize > 0) {
      z_stream zs;
      std::memset(&zs, 0, sizeof(zs));
      if (inflateInit2(&zs, -15) != Z_OK) return -1;
      zs.next_in = const_cast<uint8_t*>(cdata);
      zs.avail_in = static_cast<uInt>(cdata_len);
      zs.next_out = out + op;
      zs.avail_out = static_cast<uInt>(isize);
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END) return -1;
      op += isize;
    }
    ip += bsize;
  }
  return op;
}

namespace {

struct Member {
  int64_t ip;       // compressed offset
  int32_t bsize;    // member size
  int32_t xlen;
  int64_t op;       // decompressed offset
  uint32_t isize;
};

bool scan_members(const uint8_t* in, int64_t in_len,
                  std::vector<Member>* out_members, int64_t* total) {
  int64_t ip = 0, op = 0;
  while (ip + 18 <= in_len) {
    if (in[ip] != 0x1F || in[ip + 1] != 0x8B) return false;
    uint16_t xlen;
    std::memcpy(&xlen, in + ip + 10, 2);
    int64_t xp = ip + 12, xend = xp + xlen;
    int32_t bsize = -1;
    while (xp + 4 <= xend) {
      uint16_t slen;
      std::memcpy(&slen, in + xp + 2, 2);
      if (in[xp] == 66 && in[xp + 1] == 67 && slen == 2) {
        uint16_t bs;
        std::memcpy(&bs, in + xp + 4, 2);
        bsize = bs + 1;
        break;
      }
      xp += 4 + slen;
    }
    if (bsize < 0 || ip + bsize > in_len) return false;
    uint32_t isize;
    std::memcpy(&isize, in + ip + bsize - 4, 4);
    out_members->push_back(Member{ip, bsize, xlen, op, isize});
    op += isize;
    ip += bsize;
  }
  *total = op;
  return true;
}

bool inflate_member(const uint8_t* in, const Member& m, uint8_t* out) {
  if (m.isize == 0) return true;
  const uint8_t* cdata = in + m.ip + 12 + m.xlen;
  int64_t cdata_len = m.bsize - 12 - m.xlen - 8;
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(cdata);
  zs.avail_in = static_cast<uInt>(cdata_len);
  zs.next_out = out + m.op;
  zs.avail_out = m.isize;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END;
}

}  // namespace

// Multi-threaded BGZF inflate: members are independent gzip streams,
// so worker threads decode interleaved stripes.  Returns total
// decompressed bytes or -1.
extern "C" int64_t bgzf_inflate_all_mt(const uint8_t* in, int64_t in_len,
                                       uint8_t* out, int64_t out_cap,
                                       int32_t n_threads) {
  std::vector<Member> members;
  int64_t total = 0;
  if (!scan_members(in, in_len, &members, &total)) return -1;
  if (total > out_cap) return -1;
  if (n_threads < 1) n_threads = 1;
  if (n_threads == 1 || members.size() < 4) {
    for (const Member& m : members)
      if (!inflate_member(in, m, out)) return -1;
    return total;
  }
  std::vector<std::thread> ts;
  std::vector<uint8_t> ok(n_threads, 1);
  for (int32_t t = 0; t < n_threads; ++t) {
    ts.emplace_back([&, t]() {
      for (size_t i = t; i < members.size();
           i += static_cast<size_t>(n_threads)) {
        if (!inflate_member(in, members[i], out)) {
          ok[t] = 0;
          return;
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  for (int32_t t = 0; t < n_threads; ++t)
    if (!ok[t]) return -1;
  return total;
}

namespace {

// Deflate one BGZF member (raw deflate + BGZF extra header + CRC32
// footer) into out; returns member size or -1.  Mirrors the Python
// BgzfWriter block layout (io/bgzf.py _write_block) including the
// level-0 fallback for incompressible blocks.
int64_t deflate_member(const uint8_t* data, int64_t n, int level,
                       uint8_t* out, int64_t cap) {
  for (int attempt = 0; attempt < 2; ++attempt) {
    int lvl = attempt == 0 ? level : 0;
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, lvl, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
      return -1;
    zs.next_in = const_cast<uint8_t*>(data);
    zs.avail_in = static_cast<uInt>(n);
    zs.next_out = out + 18;
    zs.avail_out = static_cast<uInt>(cap - 26);
    int rc = deflate(&zs, Z_FINISH);
    int64_t clen = static_cast<int64_t>(zs.total_out);
    deflateEnd(&zs);
    if (rc != Z_STREAM_END) {
      if (attempt == 0) continue;  // try stored
      return -1;
    }
    int64_t bsize = clen + 26;
    if (bsize > 65536) {
      if (attempt == 0) continue;
      return -1;
    }
    // gzip header with BGZF BC extra field
    uint8_t* h = out;
    h[0] = 0x1F; h[1] = 0x8B; h[2] = 8; h[3] = 4;
    std::memset(h + 4, 0, 4);
    h[8] = 0; h[9] = 0xFF;
    uint16_t xlen = 6;
    std::memcpy(h + 10, &xlen, 2);
    h[12] = 66; h[13] = 67;
    uint16_t slen = 2;
    std::memcpy(h + 14, &slen, 2);
    uint16_t bs16 = static_cast<uint16_t>(bsize - 1);
    std::memcpy(h + 16, &bs16, 2);
    uint32_t crc = crc32(0L, data, static_cast<uInt>(n));
    std::memcpy(out + 18 + clen, &crc, 4);
    uint32_t isize = static_cast<uint32_t>(n);
    std::memcpy(out + 18 + clen + 4, &isize, 4);
    return bsize;
  }
  return -1;
}

}  // namespace

// Multi-threaded BGZF deflate: chunks `in` into 65280-byte blocks
// (the Python writer's chunking), compresses them in parallel, and
// concatenates the members into `out` (no EOF member — the caller's
// close() appends it).  Returns bytes written or -1.
extern "C" int64_t bgzf_deflate_all_mt(const uint8_t* in, int64_t in_len,
                                       int32_t level, int32_t n_threads,
                                       uint8_t* out, int64_t out_cap) {
  const int64_t CHUNK = 65280;
  int64_t n_blocks = (in_len + CHUNK - 1) / CHUNK;
  if (n_blocks == 0) return 0;
  if (out_cap < n_blocks * 65536) return -1;  // caller sizes worst case
  std::vector<int64_t> sizes(n_blocks, -1);
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n_blocks) n_threads = static_cast<int32_t>(n_blocks);
  std::vector<std::thread> ts;
  for (int32_t t = 0; t < n_threads; ++t) {
    ts.emplace_back([&, t]() {
      for (int64_t b = t; b < n_blocks; b += n_threads) {
        int64_t off = b * CHUNK;
        int64_t n = std::min(CHUNK, in_len - off);
        sizes[b] = deflate_member(in + off, n, level,
                                  out + b * 65536, 65536);
      }
    });
  }
  for (auto& th : ts) th.join();
  // compact members in place (left-to-right, no overlap hazards since
  // every member is <= its 65536 slot and dst <= src)
  int64_t op = 0;
  for (int64_t b = 0; b < n_blocks; ++b) {
    if (sizes[b] < 0) return -1;
    if (op != b * 65536)
      std::memmove(out + op, out + b * 65536, sizes[b]);
    op += sizes[b];
  }
  return op;
}

// Total decompressed size of a BGZF stream (sum of member ISIZEs).
// Returns -1 on malformed input.
int64_t bgzf_total_isize(const uint8_t* in, int64_t in_len) {
  int64_t ip = 0, total = 0;
  while (ip + 18 <= in_len) {
    if (in[ip] != 0x1F || in[ip + 1] != 0x8B) return -1;
    uint16_t xlen;
    std::memcpy(&xlen, in + ip + 10, 2);
    int64_t xp = ip + 12, xend = xp + xlen;
    int32_t bsize = -1;
    while (xp + 4 <= xend) {
      uint16_t slen;
      std::memcpy(&slen, in + xp + 2, 2);
      if (in[xp] == 66 && in[xp + 1] == 67 && slen == 2) {
        uint16_t bs;
        std::memcpy(&bs, in + xp + 4, 2);
        bsize = bs + 1;
        break;
      }
      xp += 4 + slen;
    }
    if (bsize < 0 || ip + bsize > in_len) return -1;
    uint32_t isize;
    std::memcpy(&isize, in + ip + bsize - 4, 4);
    total += isize;
    ip += bsize;
  }
  return total;
}

// Scan a decompressed BAM record stream (starting AFTER the header)
// and extract fixed fields into columnar arrays.  Returns the number
// of complete records parsed (<= cap); *consumed is set to the byte
// length of those records (callers keep the tail for the next chunk).
//
// Output layout per record i:
//   offsets[i]  byte offset of the record's block_size field
//   tid/pos/mapq/flag/lseq/mtid/mpos/isize: core fields
//   qname_off/qname_len, cigar_off/n_cigar, seq_off, qual_off,
//   aux_off/aux_len: offsets into the same buffer
int64_t bam_scan_records(const uint8_t* buf, int64_t len, int64_t cap,
                         int64_t* offsets, int32_t* tid, int32_t* pos,
                         int32_t* mapq, int32_t* flag, int32_t* lseq,
                         int32_t* mtid, int32_t* mpos, int32_t* isize,
                         int64_t* qname_off, int32_t* qname_len,
                         int64_t* cigar_off, int32_t* n_cigar,
                         int64_t* seq_off, int64_t* qual_off,
                         int64_t* aux_off, int32_t* aux_len,
                         int64_t* consumed) {
  int64_t p = 0;
  int64_t n = 0;
  while (n < cap && p + 4 <= len) {
    int32_t block_size;
    std::memcpy(&block_size, buf + p, 4);
    if (block_size < 32 || p + 4 + block_size > len) break;
    const uint8_t* r = buf + p + 4;
    offsets[n] = p;
    std::memcpy(&tid[n], r, 4);
    std::memcpy(&pos[n], r + 4, 4);
    uint8_t l_read_name = r[8];
    mapq[n] = r[9];
    uint16_t ncig, fl;
    std::memcpy(&ncig, r + 12, 2);
    std::memcpy(&fl, r + 14, 2);
    n_cigar[n] = ncig;
    flag[n] = fl;
    std::memcpy(&lseq[n], r + 16, 4);
    std::memcpy(&mtid[n], r + 20, 4);
    std::memcpy(&mpos[n], r + 24, 4);
    std::memcpy(&isize[n], r + 28, 4);
    int64_t base = p + 4 + 32;
    qname_off[n] = base;
    qname_len[n] = l_read_name - 1;
    cigar_off[n] = base + l_read_name;
    seq_off[n] = cigar_off[n] + 4LL * ncig;
    qual_off[n] = seq_off[n] + (lseq[n] + 1) / 2;
    aux_off[n] = qual_off[n] + lseq[n];
    aux_len[n] = static_cast<int32_t>(p + 4 + block_size - aux_off[n]);
    p += 4 + block_size;
    ++n;
  }
  *consumed = p;
  return n;
}

// Reference span per record from CIGAR (sum of M/D/N/=/X lengths).
void bam_ref_spans(const uint8_t* buf, int64_t n,
                   const int64_t* cigar_off, const int32_t* n_cigar,
                   int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* c = buf + cigar_off[i];
    int32_t span = 0;
    for (int32_t k = 0; k < n_cigar[i]; ++k) {
      uint32_t w;
      std::memcpy(&w, c + 4 * k, 4);
      uint32_t op = w & 0xF;
      // 0=M 2=D 3=N 7== 8=X consume reference
      if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
        span += w >> 4;
    }
    out[i] = span;
  }
}

// Unpack 4-bit BAM bases for `n` records into ASCII at dst (each
// record's bases written contiguously; dst_off[i] gives the start).
void bam_unpack_seqs(const uint8_t* buf, int64_t n,
                     const int64_t* seq_off, const int32_t* lseq,
                     uint8_t* dst, const int64_t* dst_off) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = buf + seq_off[i];
    uint8_t* d = dst + dst_off[i];
    int32_t L = lseq[i];
    for (int32_t j = 0; j < L; j += 2) {
      uint8_t b = s[j >> 1];
      d[j] = NIB2ASCII[b >> 4];
      if (j + 1 < L) d[j + 1] = NIB2ASCII[b & 0xF];
    }
  }
}

}  // extern "C"
