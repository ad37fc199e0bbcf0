// Native BAM record emission for the seqlib_tpu host runtime.
//
// Role: the write-side fast path.  The aligner's fused device program
// returns columnar per-hit arrays; this module performs the entire
// record-assembly stage — XA alternate gathering, MAPQ-desc sort,
// keepSecFrac/maxSecondary filtering, clip-op rewrite, 4-bit base
// packing with reverse-complement, tag emission — and serializes
// finished BAM (or SAM text) records, replacing the per-read Python
// loop.  Reference semantics: hand-assembled bam1_t at
// /root/reference/src/BWAAligner.cpp:133-241 plus `bwa mem`'s
// mem_gen_alt XA rules.  Byte-parity with the Python path
// (aligner._assemble_records + io.bam.encode_record) is pinned by
// tests/test_native_emit.py.
//
// Build: linked into libseqlib_native.so (see seqlib_tpu/native.py).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// BAM 4-bit nibble code for "=ACMGRSVTWYHKDBN" (case-insensitive),
// same table as seqlib_tpu.core.seq.ASCII_TO_NIB.
uint8_t ascii_to_nib_tbl[256];
// ASCII complement (identity except A<->T, C<->G, both cases; N->N),
// same as seqlib_tpu.core.seq.COMPLEMENT_TABLE.
uint8_t complement_tbl[256];

struct TableInit {
  TableInit() {
    const char* nt16 = "=ACMGRSVTWYHKDBN";
    for (int i = 0; i < 256; ++i) ascii_to_nib_tbl[i] = 15;
    for (int i = 0; i < 16; ++i) {
      ascii_to_nib_tbl[static_cast<uint8_t>(nt16[i])] = i;
      ascii_to_nib_tbl[static_cast<uint8_t>(
          std::tolower(nt16[i]))] = i;
    }
    for (int i = 0; i < 256; ++i) complement_tbl[i] = i;
    const char* from = "ACGTacgt";
    const char* to = "TGCAtgca";
    for (int i = 0; i < 8; ++i)
      complement_tbl[static_cast<uint8_t>(from[i])] =
          static_cast<uint8_t>(to[i]);
  }
} table_init_;

// SAM-spec distributed binning (mirror of io/bam.py reg2bin).
int reg2bin(int64_t beg, int64_t end) {
  --end;
  if (beg >> 14 == end >> 14) return ((1 << 15) - 1) / 7 + (beg >> 14);
  if (beg >> 17 == end >> 17) return ((1 << 12) - 1) / 7 + (beg >> 17);
  if (beg >> 20 == end >> 20) return ((1 << 9) - 1) / 7 + (beg >> 20);
  if (beg >> 23 == end >> 23) return ((1 << 6) - 1) / 7 + (beg >> 23);
  if (beg >> 26 == end >> 26) return ((1 << 3) - 1) / 7 + (beg >> 26);
  return 0;
}

// device run op codes (align/device_pipeline traceback): 0=M 1=D 2=I
constexpr uint8_t DEV_M = 0, DEV_D = 1, DEV_I = 2;
// BAM cigar op codes
constexpr uint32_t BAM_M = 0, BAM_I = 1, BAM_D = 2, BAM_S = 4,
                   BAM_H = 5;
const char BAM_OP_CHAR[10] = {'M', 'I', 'D', 'N', 'S',
                              'H', 'P', '=', 'X', 'B'};

struct Hit {
  int32_t rid, pos, score, mapq, nm, n_regs, slot, sec;
  int32_t clip5, clip3;
  int64_t cig_off;
  int32_t cig_n;        // 0 -> single M run of match_len
  int32_t match_len;
  uint8_t is_rev, is_sec;
};

// Assemble the full BAM cigar (clip5 + core runs [reversed if rev] +
// clip3) into `out` as len<<4|op words.  Returns op count.
int build_cigar(const Hit& h, const uint8_t* run_ops,
                const int32_t* run_lens, uint32_t clip_code,
                uint32_t* out) {
  int n = 0;
  if (h.clip5 > 0)
    out[n++] = (static_cast<uint32_t>(h.clip5) << 4) | clip_code;
  if (h.cig_n == 0) {
    if (h.match_len > 0)
      out[n++] = (static_cast<uint32_t>(h.match_len) << 4) | BAM_M;
  } else if (!h.is_rev) {
    for (int32_t k = 0; k < h.cig_n; ++k) {
      uint8_t op = run_ops[h.cig_off + k];
      uint32_t bam_op = op == DEV_M ? BAM_M : (op == DEV_D ? BAM_D
                                                           : BAM_I);
      out[n++] = (static_cast<uint32_t>(run_lens[h.cig_off + k]) << 4)
                 | bam_op;
    }
  } else {
    for (int32_t k = h.cig_n - 1; k >= 0; --k) {
      uint8_t op = run_ops[h.cig_off + k];
      uint32_t bam_op = op == DEV_M ? BAM_M : (op == DEV_D ? BAM_D
                                                           : BAM_I);
      out[n++] = (static_cast<uint32_t>(run_lens[h.cig_off + k]) << 4)
                 | bam_op;
    }
  }
  if (h.clip3 > 0)
    out[n++] = (static_cast<uint32_t>(h.clip3) << 4) | clip_code;
  return n;
}

}  // namespace

extern "C" {

// Encode aligned hits as BAM (mode 0) or SAM text (mode 1) records.
//
// Per-hit columnar arrays (n_hits entries) MUST be grouped by
// read_idx ascending; within one read, in the aligner's hit append
// order (main emit slots row-major, then fallback rows).  Cigar core
// runs for hit i live at run_ops/run_lens[cig_off[i] .. +cig_n[i])
// in device (2L forward) order; cig_n == 0 means a perfect match of
// match_len[i] bases.  clip5/clip3 are already in the output-strand
// frame.
//
// qname/seq blobs are per READ (n_reads+1 offsets); seq is the
// original ASCII read (forward strand, any case).
//
// Writes serialized records to `out` and per-read record counts to
// out_counts.  Returns bytes written; -1 if out_cap would overflow
// (caller grows the buffer and retries); -2 on malformed input.
int64_t bam_encode_hits(
    int64_t n_hits, const int32_t* read_idx, const int32_t* rid,
    const int32_t* pos, const uint8_t* is_rev, const uint8_t* is_sec,
    const int32_t* score, const int32_t* mapq, const int32_t* nm,
    const int32_t* n_regs, const int32_t* slot, const int32_t* sec,
    const int32_t* clip5, const int32_t* clip3,
    const int64_t* cig_off, const int32_t* cig_n,
    const uint8_t* run_ops, const int32_t* run_lens,
    const int32_t* match_len,
    int32_t n_reads, const uint8_t* qname_blob,
    const int64_t* qname_off, const uint8_t* seq_blob,
    const int64_t* seq_off,
    int32_t n_refs, const uint8_t* ref_name_blob,
    const int64_t* ref_name_off,
    int32_t hardclip, double keep_sec_frac, int32_t max_secondary,
    double xa_drop_ratio, int32_t max_xa_hits, int32_t mode,
    uint8_t* out, int64_t out_cap, int32_t* out_counts) {
  int64_t op_out = 0;
  std::vector<Hit> hits;
  std::vector<int> order;
  std::vector<std::string> xa;       // per local hit: gathered XA
  std::vector<uint32_t> cig;
  std::vector<uint8_t> seqbuf;
  char tmp[64];

  int64_t hi = 0;
  for (int32_t b = 0; b < n_reads; ++b) {
    out_counts[b] = 0;
    // ---- collect this read's hits --------------------------------
    hits.clear();
    while (hi < n_hits && read_idx[hi] == b) {
      Hit h;
      h.rid = rid[hi]; h.pos = pos[hi]; h.score = score[hi];
      h.mapq = mapq[hi]; h.nm = nm[hi]; h.n_regs = n_regs[hi];
      h.slot = slot[hi]; h.sec = sec[hi];
      h.clip5 = clip5[hi]; h.clip3 = clip3[hi];
      h.cig_off = cig_off[hi]; h.cig_n = cig_n[hi];
      h.match_len = match_len[hi];
      h.is_rev = is_rev[hi]; h.is_sec = is_sec[hi];
      hits.push_back(h);
      ++hi;
    }
    if (hi < n_hits && read_idx[hi] < b) return -2;  // not grouped
    size_t nh = hits.size();
    if (nh == 0) continue;

    // ---- XA gathering (before sort/filters; mem_gen_alt rules) ---
    xa.assign(nh, std::string());
    for (size_t i = 0; i < nh; ++i) {
      const Hit& h = hits[i];
      if (h.sec < 0) continue;
      // find the primary hit whose slot == h.sec
      int pi = -1;
      for (size_t k = 0; k < nh; ++k)
        if (hits[k].slot == h.sec) { pi = static_cast<int>(k); break; }
      if (pi < 0) continue;
      if (static_cast<double>(h.score) <
          static_cast<double>(hits[pi].score) * xa_drop_ratio)
        continue;
      if (h.rid < 0 || h.rid >= n_refs) return -2;
      std::string& s = xa[pi];
      s.append(reinterpret_cast<const char*>(
                   ref_name_blob + ref_name_off[h.rid]),
               static_cast<size_t>(ref_name_off[h.rid + 1]
                                   - ref_name_off[h.rid]));
      s.push_back(',');
      s.push_back(h.is_rev ? '-' : '+');
      std::snprintf(tmp, sizeof(tmp), "%d,", h.pos + 1);
      s.append(tmp);
      // cigar with clips as 'S' (always, even under hardclip)
      cig.resize(static_cast<size_t>(h.cig_n) + 3);
      int nc = build_cigar(h, run_ops, run_lens, BAM_S, cig.data());
      for (int k = 0; k < nc; ++k) {
        std::snprintf(tmp, sizeof(tmp), "%u%c", cig[k] >> 4,
                      BAM_OP_CHAR[cig[k] & 0xF]);
        s.append(tmp);
      }
      std::snprintf(tmp, sizeof(tmp), ",%d;", h.nm);
      s.append(tmp);
    }
    // count qualifying alternates per primary (XA dropped when the
    // count exceeds max_XA_hits; bwa's cnt[r] > max_XA_hits skip)
    std::vector<int> xa_count(nh, 0);
    for (size_t i = 0; i < nh; ++i)
      if (!xa[i].empty()) {
        int c = 0;
        for (char ch : xa[i]) c += (ch == ';');
        xa_count[i] = c;
      }

    // ---- sort: MAPQ desc, rid, pos (BWAAligner.cpp:6-12) ---------
    order.resize(nh);
    for (size_t i = 0; i < nh; ++i) order[i] = static_cast<int>(i);
    std::stable_sort(order.begin(), order.end(), [&](int a, int c) {
      if (hits[a].mapq != hits[c].mapq) return hits[a].mapq > hits[c].mapq;
      if (hits[a].rid != hits[c].rid) return hits[a].rid < hits[c].rid;
      return hits[a].pos < hits[c].pos;
    });

    // ---- emit with keepSecFrac/maxSecondary filters --------------
    double primary_score = 0.0;
    int64_t qn_len = qname_off[b + 1] - qname_off[b];
    if (qn_len + 1 > 255) return -2;   // BAM l_read_name is uint8
    const uint8_t* qn = qname_blob + qname_off[b];
    const uint8_t* sq = seq_blob + seq_off[b];
    int64_t sq_len = seq_off[b + 1] - seq_off[b];
    for (size_t i = 0; i < nh; ++i) {
      const Hit& h = hits[order[i]];
      bool too_low = h.is_sec
          && primary_score * keep_sec_frac
                 > static_cast<double>(h.score);
      bool too_many = h.is_sec
          && static_cast<int64_t>(i) > max_secondary;
      if (too_low || too_many) continue;
      if (!h.is_sec) primary_score = static_cast<double>(h.score);

      // cigar with clip op S (softclip) or H (hardclip)
      cig.resize(static_cast<size_t>(h.cig_n) + 3);
      int nc = build_cigar(h, run_ops, run_lens,
                           hardclip ? BAM_H : BAM_S, cig.data());
      // clipped query window under hardclip (BWAAligner.cpp:164-177)
      int64_t tstart = 0, clen = sq_len;
      if (hardclip) {
        int64_t c = 0;
        for (int k = 0; k < nc; ++k) {
          uint32_t bop = cig[k] & 0xF;
          if (k == 0 && bop == BAM_H)
            tstart = cig[k] >> 4;
          else if (bop == BAM_M || bop == BAM_I || bop == BAM_S)
            c += cig[k] >> 4;
        }
        if (c) clen = c; else tstart = 0;
      }
      if (tstart + clen > sq_len) return -2;
      int64_t l_seq = clen;

      // reference span for the bin (M + D consume reference)
      int64_t span = 0;
      for (int k = 0; k < nc; ++k) {
        uint32_t bop = cig[k] & 0xF;
        if (bop == BAM_M || bop == BAM_D) span += cig[k] >> 4;
      }
      int bin = reg2bin(h.pos < 0 ? 0 : h.pos,
                        std::max<int64_t>(h.pos + std::max<int64_t>(
                                              span, 1), 1));
      int flag = (h.is_sec ? 256 : 0) | (h.is_rev ? 16 : 0);

      // xa is indexed by local (pre-sort) hit position
      size_t local = static_cast<size_t>(order[i]);
      bool emit_xa = !h.is_sec && !xa[local].empty()
                     && xa_count[local] <= max_xa_hits;

      // ---- serialize ------------------------------------------------
      if (mode == 1) {
        // SAM text line (to_sam parity): qname flag rname pos1 mapq
        // cigar * 0 0 seq * tags
        std::string line;
        line.reserve(128 + l_seq);
        line.append(reinterpret_cast<const char*>(qn),
                    static_cast<size_t>(qn_len));
        std::snprintf(tmp, sizeof(tmp), "\t%d\t", flag);
        line.append(tmp);
        if (h.rid >= 0 && h.rid < n_refs)
          line.append(reinterpret_cast<const char*>(
                          ref_name_blob + ref_name_off[h.rid]),
                      static_cast<size_t>(ref_name_off[h.rid + 1]
                                          - ref_name_off[h.rid]));
        else
          line.push_back('*');
        std::snprintf(tmp, sizeof(tmp), "\t%d\t%d\t", h.pos + 1,
                      h.mapq);
        line.append(tmp);
        for (int k = 0; k < nc; ++k) {
          std::snprintf(tmp, sizeof(tmp), "%u%c", cig[k] >> 4,
                        BAM_OP_CHAR[cig[k] & 0xF]);
          line.append(tmp);
        }
        if (!nc) line.push_back('*');
        line.append("\t*\t0\t0\t");
        size_t sp = line.size();
        line.resize(sp + l_seq);
        if (!h.is_rev) {
          for (int64_t j = 0; j < l_seq; ++j)
            line[sp + j] = std::toupper(sq[tstart + j]);
        } else {
          for (int64_t j = 0; j < l_seq; ++j)
            line[sp + j] = complement_tbl[sq[tstart + l_seq - 1 - j]];
        }
        line.append("\t*");
        std::snprintf(tmp, sizeof(tmp), "\tNA:i:%d\tNM:i:%d",
                      h.n_regs, h.nm);
        line.append(tmp);
        if (emit_xa) {
          line.append("\tXA:Z:");
          line.append(xa[local]);
        }
        std::snprintf(tmp, sizeof(tmp), "\tAS:i:%d\n", h.score);
        line.append(tmp);
        if (op_out + static_cast<int64_t>(line.size()) > out_cap)
          return -1;
        std::memcpy(out + op_out, line.data(), line.size());
        op_out += line.size();
        ++out_counts[b];
        continue;
      }

      int64_t aux_len = 7 + 7 + 7;  // NA:i NM:i AS:i (4-byte ints)
      if (emit_xa) aux_len += 4 + xa[local].size();  // XA Z NUL
      int64_t body = 32 + (qn_len + 1) + 4LL * nc + (l_seq + 1) / 2
                     + l_seq + aux_len;
      if (op_out + 4 + body > out_cap) return -1;
      uint8_t* p = out + op_out;
      auto put_i32 = [&p](int32_t v) {
        std::memcpy(p, &v, 4); p += 4;
      };
      auto put_u16 = [&p](uint16_t v) {
        std::memcpy(p, &v, 2); p += 2;
      };
      put_i32(static_cast<int32_t>(body));
      put_i32(h.rid);
      put_i32(h.pos);
      *p++ = static_cast<uint8_t>(qn_len + 1);
      *p++ = static_cast<uint8_t>(h.mapq);
      put_u16(static_cast<uint16_t>(bin));
      put_u16(static_cast<uint16_t>(nc));
      put_u16(static_cast<uint16_t>(flag));
      put_i32(static_cast<int32_t>(l_seq));
      put_i32(-1);          // mtid
      put_i32(-1);          // mpos
      put_i32(0);           // isize
      std::memcpy(p, qn, qn_len); p += qn_len;
      *p++ = 0;
      std::memcpy(p, cig.data(), 4LL * nc); p += 4LL * nc;
      // 4-bit pack, reverse-complement for reverse-strand hits
      // (BWAAligner.cpp:206-233)
      seqbuf.resize(static_cast<size_t>(l_seq));
      if (!h.is_rev) {
        for (int64_t j = 0; j < l_seq; ++j)
          seqbuf[j] = ascii_to_nib_tbl[sq[tstart + j]];
      } else {
        for (int64_t j = 0; j < l_seq; ++j)
          seqbuf[j] = ascii_to_nib_tbl[
              complement_tbl[sq[tstart + l_seq - 1 - j]]];
      }
      for (int64_t j = 0; j + 1 < l_seq; j += 2)
        *p++ = static_cast<uint8_t>((seqbuf[j] << 4) | seqbuf[j + 1]);
      if (l_seq % 2)
        *p++ = static_cast<uint8_t>(seqbuf[l_seq - 1] << 4);
      std::memset(p, 0xFF, l_seq); p += l_seq;   // null quals
      // tags in Python-path insertion order: NA NM [XA] AS
      auto put_tag_i = [&](char a, char c, int32_t v) {
        *p++ = a; *p++ = c; *p++ = 'i';
        std::memcpy(p, &v, 4); p += 4;
      };
      put_tag_i('N', 'A', h.n_regs);
      put_tag_i('N', 'M', h.nm);
      if (emit_xa) {
        *p++ = 'X'; *p++ = 'A'; *p++ = 'Z';
        std::memcpy(p, xa[local].data(), xa[local].size());
        p += xa[local].size();
        *p++ = 0;
      }
      put_tag_i('A', 'S', h.score);
      op_out = p - out;
      ++out_counts[b];
    }
  }
  if (hi != n_hits) return -2;  // read_idx referenced out-of-range read
  return op_out;
}

}  // extern "C"
