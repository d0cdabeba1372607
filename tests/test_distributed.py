"""Real jax.distributed multi-process collectives (SURVEY.md §4.4: "N local
processes, jax.distributed.initialize with local coordinator" — the 2-host
semantics test BASELINE.json config 5 requires).

Two CLI processes form one SPMD program over a global CPU mesh (Gloo
collectives); the error-profile count matrix is psum'd IN-STEP across them.
Merged SAM + profile must equal the single-process run byte-for-byte."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from parasuite_tpu.errormodel.infer import ErrorProfile
from parasuite_tpu.io.fasta import write_fasta
from parasuite_tpu.io.fastq import write_fastq
from parasuite_tpu.sim import simulate_reads

REPO = Path(__file__).resolve().parent.parent
CFG_FLAGS = ["--max-read-len", "50", "--kmer-size", "8", "--band-width", "3",
             "--batch-size", "32"]


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    # 4 virtual devices per process -> global mesh of 8 over 2 processes
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


def _cli(*argv, cwd):
    p = subprocess.run([sys.executable, "-m", "parasuite_tpu.cli",
                        *map(str, argv)], capture_output=True, text=True,
                       cwd=cwd, env=_env(), timeout=900)
    assert p.returncode == 0, p.stderr[-3000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, tiny_ref, small_cfg):
    d = tmp_path_factory.mktemp("dist")
    seqs = {name: tiny_ref.seq[tiny_ref.starts[i]:tiny_ref.ends[i]]
            for i, name in enumerate(tiny_ref.names)}
    write_fasta(d / "ref.fa", seqs)
    _cli("index", d / "ref.fa", d / "idx", *CFG_FLAGS, cwd=d)
    codes, lengths, truth = simulate_reads(tiny_ref, 200, 50, small_cfg,
                                           seed=31, tc_rate=0.12)
    write_fastq(d / "reads.fastq", truth.names(), codes, lengths)
    return d


def test_jax_distributed_two_process_matches_single(workdir):
    d = workdir
    # baseline: single-process file-side path
    _cli("dist-align", d / "idx", d / "reads.fastq", d / "one",
         "--host-index", "0", "--n-hosts", "1", *CFG_FLAGS, cwd=d)
    _cli("merge-shards", d / "idx", d / "one", d / "one.sam", "--n-hosts",
         "1", "--profile-out", d / "one.errorprofile", "--pg-cl", "merge",
         *CFG_FLAGS, cwd=d)

    # 2 real jax.distributed processes: in-step psum over the global mesh
    port = _free_port()
    procs = []
    for pid in range(2):
        argv = [sys.executable, "-m", "parasuite_tpu.cli", "dist-align",
                str(d / "idx"), str(d / "reads.fastq"), str(d / "two"),
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid), *CFG_FLAGS]
        procs.append(subprocess.Popen(argv, cwd=d, env=_env(),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    outs = []
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (
            f"process {pid} failed:\n{err.decode()[-3000:]}")
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))
    assert all(o["mode"] == "jax.distributed" for o in outs)
    assert sum(o["records"] for o in outs) == 200

    _cli("merge-shards", d / "idx", d / "two", d / "two.sam", "--n-hosts",
         "2", "--profile-out", d / "two.errorprofile", "--pg-cl", "merge",
         *CFG_FLAGS, cwd=d)

    # byte-identical SAM at any host count (SURVEY.md §4.5) — now across a
    # REAL multi-process run, not just file-side simulation
    assert (d / "two.sam").read_bytes() == (d / "one.sam").read_bytes()

    # the psum'd count matrix equals the single-process accumulation exactly
    p1 = ErrorProfile.load(d / "one.errorprofile")
    p2 = ErrorProfile.load(d / "two.errorprofile")
    np.testing.assert_array_equal(p1.counts, p2.counts)
    np.testing.assert_array_equal(p1.ins_counts, p2.ins_counts)
    np.testing.assert_array_equal(p1.del_counts, p2.del_counts)
    assert p1.n_reads == p2.n_reads


def test_jax_distributed_combined_matches_file_side(workdir):
    """Coordinator SPMD mode on a COMBINED genome+transcriptome index
    (VERDICT r4 missing #4): 2 real jax.distributed processes must produce a
    merged SAM byte-identical to file-side sharding, and the summed
    emitted-record profile must match."""
    d = workdir
    (d / "cann.tsv").write_text("txA\tchrA\t+\t1200,2400\t1500,2700\n")
    _cli("combine", d / "ref.fa", d / "cann.tsv", d / "cidx", *CFG_FLAGS,
         cwd=d)
    _cli("simulate", d / "cidx", d / "creads.fastq", "--n-reads", "160",
         "--tc-rate", "0.12", *CFG_FLAGS, cwd=d)

    # baseline: file-side sharding (the previously-supported combined path)
    for h in range(2):
        _cli("dist-align", d / "cidx", d / "creads.fastq", d / "cfile",
             "--host-index", str(h), "--n-hosts", "2", *CFG_FLAGS, cwd=d)
    _cli("merge-shards", d / "cidx", d / "cfile", d / "cfile.sam",
         "--n-hosts", "2", "--profile-out", d / "cfile.errorprofile",
         "--pg-cl", "merge", *CFG_FLAGS, cwd=d)

    port = _free_port()
    procs = []
    for pid in range(2):
        argv = [sys.executable, "-m", "parasuite_tpu.cli", "dist-align",
                str(d / "cidx"), str(d / "creads.fastq"), str(d / "ccoord"),
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid), *CFG_FLAGS]
        procs.append(subprocess.Popen(argv, cwd=d, env=_env(),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (
            f"process {pid} failed:\n{err.decode()[-3000:]}")
    _cli("merge-shards", d / "cidx", d / "ccoord", d / "ccoord.sam",
         "--n-hosts", "2", "--profile-out", d / "ccoord.errorprofile",
         "--pg-cl", "merge", *CFG_FLAGS, cwd=d)

    assert (d / "ccoord.sam").read_bytes() == (d / "cfile.sam").read_bytes()
    p1 = ErrorProfile.load(d / "cfile.errorprofile")
    p2 = ErrorProfile.load(d / "ccoord.errorprofile")
    np.testing.assert_array_equal(p1.counts, p2.counts)
    np.testing.assert_array_equal(p1.ins_counts, p2.ins_counts)
    np.testing.assert_array_equal(p1.del_counts, p2.del_counts)
    assert p1.n_reads == p2.n_reads
