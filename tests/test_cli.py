"""CLI (seqtools-equivalent) end-to-end tests."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/tests/data"


def run_cli(args, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from seqlib_tpu.cli import main; import sys;"
         "sys.exit(main(sys.argv[1:]))", *args],
        capture_output=True, text=True, timeout=500, env=env, **kw)


@pytest.fixture(scope="module")
def small_fastq(tmp_path_factory):
    """First 100 reads of the reference fastq."""
    tmp = tmp_path_factory.mktemp("cli")
    src = os.path.join(DATA, "sim1_bcr.fq")
    dst = tmp / "small.fq"
    with open(src) as fin, open(dst, "w") as fout:
        for i, line in enumerate(fin):
            if i >= 400:
                break
            fout.write(line)
    return str(dst)


@pytest.fixture(scope="module")
def indexed_ref(tmp_path_factory):
    import shutil
    tmp = tmp_path_factory.mktemp("ref")
    fa = str(tmp / "tiny.fa")
    shutil.copy(os.path.join(DATA, "tiny.fa"), fa)
    r = run_cli(["index", fa])
    assert r.returncode == 0, r.stderr
    return fa


def test_cli_usage():
    r = run_cli([])
    assert r.returncode != 0


def test_cli_index(indexed_ref):
    for ext in (".bwt", ".pac", ".sa", ".ann", ".amb"):
        assert os.path.exists(indexed_ref + ext)
    # byte-identical to the reference-shipped bwa index
    for ext in (".bwt", ".pac", ".sa"):
        ours = open(indexed_ref + ext, "rb").read()
        theirs = open(os.path.join(DATA, "tiny.fa" + ext), "rb").read()
        assert ours == theirs


def test_cli_bfc_fasta_out(small_fastq):
    r = run_cli(["bfc", "-f", "-F", small_fastq])
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 200  # 100 reads as fasta
    assert lines[0].startswith(">")


def test_cli_bfc_realign_sam(small_fastq, indexed_ref):
    r = run_cli(["bfc", "-F", small_fastq, "-G", indexed_ref])
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l and not
             l.startswith("@")]
    assert len(lines) >= 90
    f = lines[0].split("\t")
    assert f[2] in ("bcr", "abl", "tp53", "myc")
    header = [l for l in r.stdout.splitlines() if l.startswith("@SQ")]
    assert len(header) == 4


def test_cli_fml_assembles(small_fastq):
    r = run_cli(["fml", "-f", "-F", small_fastq])
    assert r.returncode == 0, r.stderr
    contigs = [l for l in r.stdout.splitlines() if not l.startswith(">")]
    assert contigs
    assert all(set(c) <= set("ACGTN") for c in contigs)


def test_cli_align_bam_out(small_fastq, indexed_ref, tmp_path):
    out = str(tmp_path / "out.bam")
    r = run_cli(["align", "-b", "-F", small_fastq, "-G", indexed_ref,
                 "-o", out])
    assert r.returncode == 0, r.stderr
    from seqlib_tpu.io import BamReader
    rd = BamReader(out)
    recs = list(iter(rd.next, None))
    assert len(recs) >= 90
    assert rd.header().num_sequences() == 4


def test_readme_example_runs():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "readme_examples.py")],
        capture_output=True, text=True, timeout=400,
        env={**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert "alignment" in r.stdout
    assert "my_seq" in r.stdout


def test_cli_paired_align(indexed_ref, tmp_path):
    r1 = os.path.join(DATA, "sim1_bcr.fq")
    r2 = os.path.join(DATA, "sim2_bcr.fq")
    # subset to keep runtime small
    s1, s2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    for src, dst in ((r1, s1), (r2, s2)):
        with open(src) as fin, open(dst, "w") as fout:
            for i, line in enumerate(fin):
                if i >= 200:
                    break
                fout.write(line)
    out = str(tmp_path / "paired.bam")
    r = run_cli(["align", "-b", "-F", s1, "-2", s2, "-G", indexed_ref,
                 "-o", out])
    assert r.returncode == 0, r.stderr
    from seqlib_tpu.io import BamReader
    rd = BamReader(out)
    recs = list(iter(rd.next, None))
    assert len(recs) >= 90
    paired = [x for x in recs if x.paired_flag()]
    assert paired
    r1s = [x for x in recs if x.flag & 0x40]
    r2s = [x for x in recs if x.flag & 0x80]
    assert r1s and r2s
    proper = [x for x in recs if x.proper_pair()]
    assert proper  # FR pairs within insert range
