"""Real 2-process multi-host test: jax.distributed over CPU, per-host
local meshes, host-sharded reads, DCN-psum'd stats, per-host BAM parts
(BASELINE.md config 5 mechanics at miniature scale).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(400)
def test_two_process_multihost(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(i), "2", str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=380)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    totals = []
    local_sum = 0
    for out in outs:
        m = re.search(r"RESULT pid=(\d+) local_records=(\d+) "
                      r"total_records=(\d+) total_reads=(\d+)", out)
        assert m, out[-1500:]
        local_sum += int(m.group(2))
        totals.append((int(m.group(3)), int(m.group(4))))
    # both processes agree on the psum'd totals
    assert totals[0] == totals[1]
    assert totals[0][0] == local_sum
    assert totals[0][1] == 64
    # part files exist and are readable
    from seqlib_tpu.io import BamReader
    n = 0
    for i in range(2):
        part = str(tmp_path / f"out.part{i:04d}.bam")
        assert os.path.exists(part)
        rd = BamReader(part)
        n += sum(1 for _ in iter(rd.next, None))
    assert n == local_sum
