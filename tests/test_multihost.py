"""Multi-host simulation: N real subprocesses, merged output must be
byte-identical to the single-host run at any host count (SURVEY.md §4.4-4.5;
BASELINE.json config 5 in miniature)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from parasuite_tpu.errormodel.infer import ErrorProfile
from parasuite_tpu.io.fastq import write_fastq
from parasuite_tpu.io.fasta import write_fasta
from parasuite_tpu.sim import simulate_reads

REPO = Path(__file__).resolve().parent.parent
CFG_FLAGS = ["--max-read-len", "50", "--kmer-size", "8", "--band-width", "3",
             "--batch-size", "32"]


def _cli(*argv, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run([sys.executable, "-m", "parasuite_tpu.cli",
                        *map(str, argv)], capture_output=True, text=True,
                       cwd=cwd, env=env, timeout=900)
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, tiny_ref, small_cfg):
    d = tmp_path_factory.mktemp("mh")
    seqs = {name: tiny_ref.seq[tiny_ref.starts[i]:tiny_ref.ends[i]]
            for i, name in enumerate(tiny_ref.names)}
    write_fasta(d / "ref.fa", seqs)
    _cli("index", d / "ref.fa", d / "idx", *CFG_FLAGS, cwd=d)
    codes, lengths, truth = simulate_reads(tiny_ref, 200, 50, small_cfg,
                                           seed=31, tc_rate=0.12)
    write_fastq(d / "reads.fastq", truth.names(), codes, lengths)
    return d


def _run_hosts(d, tag: str, n_hosts: int) -> None:
    """dist-align each host shard (real subprocesses), then merge.

    --pg-cl pins the @PG CL: line so merges at different host counts can be
    compared as raw bytes (the determinism property under test)."""
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(n_hosts) as ex:
        futs = [ex.submit(_cli, "dist-align", d / "idx", d / "reads.fastq",
                          d / tag, "--host-index", str(h), "--n-hosts",
                          str(n_hosts), *CFG_FLAGS, cwd=d)
                for h in range(n_hosts)]
        outs = [f.result() for f in futs]
    assert sum(o["records"] for o in outs) == 200
    _cli("merge-shards", d / "idx", d / tag, d / f"{tag}.sam", "--n-hosts",
         str(n_hosts), "--profile-out", d / f"{tag}.errorprofile",
         "--pg-cl", "merge", *CFG_FLAGS, cwd=d)


def test_multihost_merge_matches_single(workdir):
    """SURVEY.md §4.5 determinism: same reads, ANY host count -> byte
    -identical merged SAM (1 vs 3 vs 5 hosts; 200 reads / batch 32 = 7
    batches, so both multi-host layouts are uneven round-robins)."""
    d = workdir
    _run_hosts(d, "one", 1)
    _run_hosts(d, "three", 3)
    _run_hosts(d, "five", 5)

    one = (d / "one.sam").read_bytes()
    three = (d / "three.sam").read_bytes()
    five = (d / "five.sam").read_bytes()
    assert one == three
    assert one == five
    n_rec = sum(1 for l in one.splitlines() if not l.startswith(b"@"))
    assert n_rec == 200

    # profile counts identical (order-free integer adds)
    p1 = ErrorProfile.load(d / "one.errorprofile")
    for tag in ("three", "five"):
        p = ErrorProfile.load(d / f"{tag}.errorprofile")
        np.testing.assert_array_equal(p1.counts, p.counts)
        assert p1.n_reads == p.n_reads


def test_merge_refuses_incomplete_shards(workdir, tmp_path):
    d = workdir
    from parasuite_tpu.index import PackedReference
    from parasuite_tpu.parallel.multihost import merge_host_outputs

    ref = PackedReference.load(d / "idx")
    with pytest.raises(RuntimeError, match="shard not finished"):
        merge_host_outputs(ref, d / "nonexistent", tmp_path / "x.sam", 2)
