"""Host BAM I/O benchmark (the reference's own benchmark workload:
read N records "into a vector" — /root/reference/benchmark/
benchmark.cpp:50-58 reads 5M; we default to 1M and report rec/s).

Run manually: python bench_io.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from seqlib_tpu.core import BamHeader, BamRecord, Cigar
    from seqlib_tpu.io import BamWriter
    from seqlib_tpu.io.fast_bam import FastBamReader

    n = int(os.environ.get("BENCH_IO_RECORDS", "1000000"))
    path = "/tmp/bench_io.bam"
    if not os.path.exists(path + f".{n}.ok"):
        print(f"writing {n} records...", file=sys.stderr)
        hdr = BamHeader([("c1", 1 << 30)])
        w = BamWriter()
        w.open(path)
        w.set_header(hdr)
        rec = BamRecord()
        rec.qname = "read0000000"
        rec.tid = 0
        rec.mapq = 60
        rec.flag = 99
        rec.seq = "ACGT" * 37 + "AC"
        rec.qual = np.full(150, 30, np.uint8)
        rec.cigar = Cigar("150M")
        rec.mtid = 0
        rec.isize = 300
        rec.add_int_tag("NM", 1)
        for i in range(n):
            rec.pos = i * 5
            rec.mpos = i * 5 + 200
            w.write_record(rec)
        w.close()
        open(path + f".{n}.ok", "w").write("1")

    rd = FastBamReader(path)
    t0 = time.time()
    total = 0
    batches = []
    while True:
        b = rd.read_batch()
        if b is None:
            break
        total += len(b)
        batches.append(b)  # "into a vector"
    dt = time.time() - t0
    print(json.dumps({
        "metric": "bam_read_records_per_sec",
        "value": round(total / dt, 1),
        "unit": "rec/s",
        "records": total,
        "seconds": round(dt, 2),
    }))

    # part B of the reference workload: 1000 random 10 kb region jumps
    # (benchmark.cpp:89-100) through the BAI index
    from seqlib_tpu.io import BamReader
    from seqlib_tpu.core import GenomicRegion
    if not os.path.exists(path + ".bai"):
        print("building .bai...", file=sys.stderr)
        w2 = BamWriter()
        w2._path = path
        w2._fmt = 4
        w2.build_index()
    from seqlib_tpu.io.bai import BaiIndex
    from seqlib_tpu.io.fast_bam import fetch_region
    rng = np.random.default_rng(0)
    bai = BaiIndex.load(path + ".bai")
    t0 = time.time()
    jumps = 1000
    hit_records = 0
    for _ in range(jumps):
        p = int(rng.integers(1, 5 * n - 10000))
        b = fetch_region(path, 0, p, p + 10000, bai=bai)
        hit_records += 0 if b is None else len(b)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "bam_region_jumps_per_sec",
        "value": round(jumps / dt, 1),
        "unit": "jumps/s",
        "records_touched": hit_records,
        "seconds": round(dt, 2),
    }))


    # part C: write side.  (a) the per-record Python path
    # (encode_record + incremental BGZF), (b) the native fast path
    # (pre-serialized payload through MT BGZF deflate,
    # BamWriter.write_records_bytes) — the r3 review flagged the I/O
    # story as half-native; this records both numbers.
    from seqlib_tpu.io.bam import encode_record
    hdr = BamHeader([("c1", 1 << 30)])
    rec = BamRecord()
    rec.qname = "read0000000"
    rec.tid = 0
    rec.mapq = 60
    rec.flag = 99
    rec.seq = "ACGT" * 37 + "AC"
    rec.qual = np.full(150, 30, np.uint8)
    rec.cigar = Cigar("150M")
    rec.mtid = 0
    rec.isize = 300
    rec.add_int_tag("NM", 1)
    n_w = min(n, 250_000)
    t0 = time.time()
    w = BamWriter()
    w.open("/tmp/bench_io_wr_py.bam")
    w.set_header(hdr)
    for i in range(n_w):
        rec.pos = i * 5
        w.write_record(rec)
    w.close()
    dt_py = time.time() - t0
    print(json.dumps({
        "metric": "bam_write_records_per_sec_python",
        "value": round(n_w / dt_py, 1),
        "unit": "rec/s", "records": n_w,
    }))
    payload = encode_record(rec) * n_w
    t0 = time.time()
    w = BamWriter()
    w.open("/tmp/bench_io_wr_native.bam")
    w.set_header(hdr)
    w.write_records_bytes(payload)
    w.close()
    dt_nat = time.time() - t0
    print(json.dumps({
        "metric": "bam_write_records_per_sec_native",
        "value": round(n_w / dt_nat, 1),
        "unit": "rec/s", "records": n_w,
    }))


if __name__ == "__main__":
    main()
