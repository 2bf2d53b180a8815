"""Multi-host data parallelism: two jax.distributed CPU processes must
produce a merged SAM byte-identical to the single-process run (SE), and
a consistent psum-merged insert model (PE).

Mirrors the reference's per-thread shard scheme
(align_reads_dispatcher.hpp:258-289) generalized across hosts with
deterministic contiguous read ranges (monitpu/parallel/dist.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(5)
    alph = "ACGT"
    seq = "".join(alph[i] for i in rng.integers(0, 4, size=40000))
    (tmp / "ref.fa").write_text(
        ">chrA\n" + "\n".join(seq[i:i + 70]
                              for i in range(0, len(seq), 70)) + "\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    with open(tmp / "reads.fq", "w") as f:
        for r in range(120):
            s = int(rng.integers(0, len(seq) - 120))
            rd = list(seq[s:s + 120])
            for p in rng.integers(0, 120, size=2):
                rd[p] = alph[int(rng.integers(0, 4))]
            rd = "".join(rd)
            if r % 2:
                rd = "".join(comp[c] for c in reversed(rd))
            f.write(f"@read{r}\n{rd}\n+\n{'I' * 120}\n")
    env = _env()
    subprocess.run(
        [sys.executable, "-m", "monitpu.cli", "build", "-r",
         str(tmp / "ref.fa"), "-o", str(tmp / "idx")],
        check=True, env=env, cwd=REPO, capture_output=True)
    return tmp


def _env(extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    if extra:
        env.update(extra)
    return env


def _align(data, out, extra_args=(), env=None, wait=True):
    cmd = [sys.executable, "-m", "monitpu.cli", "align",
           "-i", str(data / "idx"), "-p", str(data / "reads.fq"),
           "-o", str(out), "-b", "32"] + list(extra_args)
    p = subprocess.Popen(cmd, env=env or _env(), cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    if not wait:
        return p
    so, se = p.communicate(timeout=420)
    assert p.returncode == 0, se.decode()[-2000:]
    return p


def test_two_host_merged_sam_identical(data):
    single = data / "single.sam"
    _align(data, single, ["--engine", "cpu"])

    merged = data / "dist.sam"
    port = _free_port()
    procs = [
        _align(data, merged,
               ["--engine", "cpu", "--dist-nprocs", "2",
                "--dist-procid", str(i),
                "--dist-coordinator", f"localhost:{port}"],
               wait=False)
        for i in range(2)
    ]
    for p in procs:
        so, se = p.communicate(timeout=420)
        assert p.returncode == 0, se.decode()[-2000:]
    assert merged.exists()
    assert merged.read_bytes() == single.read_bytes()
    assert not (data / "dist.sam.shard0").exists()  # shards cleaned up
