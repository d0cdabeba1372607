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


def test_multihost_merge_matches_single(workdir):
    d = workdir
    # single host
    _cli("dist-align", d / "idx", d / "reads.fastq", d / "one",
         "--host-index", "0", "--n-hosts", "1", *CFG_FLAGS, cwd=d)
    _cli("merge-shards", d / "idx", d / "one", d / "one.sam", "--n-hosts",
         "1", "--profile-out", d / "one.errorprofile", *CFG_FLAGS, cwd=d)

    # three hosts as real subprocesses
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(_cli, "dist-align", d / "idx", d / "reads.fastq",
                          d / "three", "--host-index", str(h), "--n-hosts",
                          "3", *CFG_FLAGS, cwd=d) for h in range(3)]
        outs = [f.result() for f in futs]
    assert sum(o["records"] for o in outs) == 200
    _cli("merge-shards", d / "idx", d / "three", d / "three.sam", "--n-hosts",
         "3", "--profile-out", d / "three.errorprofile", *CFG_FLAGS, cwd=d)

    one = (d / "one.sam").read_text()
    three = (d / "three.sam").read_text()
    # same set of records; order differs only by the documented round-robin
    # interleave -> compare sorted record lines and exact header
    h1 = [l for l in one.splitlines() if l.startswith("@")]
    h3 = [l for l in three.splitlines() if l.startswith("@")]
    assert [l for l in h1 if not l.startswith("@PG")] == \
           [l for l in h3 if not l.startswith("@PG")]
    r1 = sorted(l for l in one.splitlines() if not l.startswith("@"))
    r3 = sorted(l for l in three.splitlines() if not l.startswith("@"))
    assert r1 == r3 and len(r1) == 200

    # profile counts identical (order-free integer adds)
    p1 = ErrorProfile.load(d / "one.errorprofile")
    p3 = ErrorProfile.load(d / "three.errorprofile")
    np.testing.assert_array_equal(p1.counts, p3.counts)
    assert p1.n_reads == p3.n_reads


def test_merge_refuses_incomplete_shards(workdir, tmp_path):
    d = workdir
    from parasuite_tpu.index import PackedReference
    from parasuite_tpu.parallel.multihost import merge_host_outputs

    ref = PackedReference.load(d / "idx")
    with pytest.raises(RuntimeError, match="shard not finished"):
        merge_host_outputs(ref, d / "nonexistent", tmp_path / "x.sam", 2)
