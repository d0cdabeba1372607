"""CLI toolkit end-to-end (SURVEY.md §2 component 1), via real subprocesses."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(*argv, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run([sys.executable, "-m", "parasuite_tpu.cli", *map(str, argv)],
                       capture_output=True, text=True, cwd=cwd, env=env,
                       timeout=600)
    assert p.returncode == 0, f"cli failed: {p.stderr[-2000:]}"
    return json.loads(p.stdout.strip().splitlines()[-1])


CFG_FLAGS = ["--max-read-len", "50", "--kmer-size", "8", "--band-width", "3",
             "--batch-size", "64"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, tiny_ref):
    d = tmp_path_factory.mktemp("cli")
    from parasuite_tpu.io.fasta import write_fasta

    seqs = {name: tiny_ref.seq[tiny_ref.starts[i]:tiny_ref.ends[i]]
            for i, name in enumerate(tiny_ref.names)}
    write_fasta(d / "ref.fa", seqs)
    return d


def test_cli_full_pipeline(workdir):
    d = workdir
    out = run_cli("index", d / "ref.fa", d / "idx", *CFG_FLAGS, cwd=d)
    assert out["chroms"] == 2

    out = run_cli("simulate", d / "idx", d / "reads.fastq", "--n-reads", "200",
                  "--tc-rate", "0.15", *CFG_FLAGS, cwd=d)
    assert out["reads"] == 200 and out["conversions"] > 0

    out = run_cli("align", d / "idx", d / "reads.fastq", d / "out.sam",
                  *CFG_FLAGS, cwd=d)
    assert out["reads"] == 200
    sam = (d / "out.sam").read_text().splitlines()
    assert sum(1 for l in sam if not l.startswith("@")) == 200
    assert (d / "out.sam.config.json").exists()

    out = run_cli("twopass", d / "idx", d / "reads.fastq", d / "tp.sam",
                  *CFG_FLAGS, cwd=d)
    assert out["profiled_reads"] > 150
    assert Path(out["profile"]).exists()

    # align again consuming the learned profile
    out = run_cli("align", d / "idx", d / "reads.fastq", d / "out2.sam",
                  "--profile", out["profile"], *CFG_FLAGS, cwd=d)
    assert out["reads"] == 200

    out = run_cli("cluster", d / "idx", d / "tp.sam", d / "clusters.tsv",
                  "--cluster-min-reads", "1", *CFG_FLAGS, cwd=d)
    assert out["alignments"] > 150
    lines = (d / "clusters.tsv").read_text().splitlines()
    assert lines[0].startswith("#chrom")

    out = run_cli("benchmark", d / "idx", "--n-reads", "100", *CFG_FLAGS, cwd=d)
    assert out["sensitivity"] > 0.9
    assert out["items_per_second"] > 0


def test_cli_combined(workdir):
    d = workdir
    (d / "ann.tsv").write_text("txA\tchrA\t+\t1200,2400\t1500,2700\n")
    out = run_cli("combine", d / "ref.fa", d / "ann.tsv", d / "cidx",
                  *CFG_FLAGS, cwd=d)
    assert out["transcripts"] == 1

    # simulate reads from the combined index (includes transcript space),
    # then align back: junction reads must project cleanly
    out = run_cli("simulate", d / "cidx", d / "creads.fastq", "--n-reads",
                  "120", *CFG_FLAGS, cwd=d)
    out = run_cli("align", d / "cidx", d / "creads.fastq", d / "cout.sam",
                  *CFG_FLAGS, cwd=d)
    assert out["reads"] == 120
    recs = [l.split("\t") for l in (d / "cout.sam").read_text().splitlines()
            if not l.startswith("@")]
    mapped = [r for r in recs if r[1] != "4"]
    assert len(mapped) > 100
    assert all(not r[2].startswith("tx::") for r in mapped)
    # at least one junction CIGAR from reads simulated inside transcripts
    assert any("N" in r[5] for r in mapped)

    # cluster recount walks junction/gapped CIGARs (genome-coordinate SAM
    # against the genome-only index)
    out = run_cli("cluster", d / "idx", d / "cout.sam", d / "cclusters.tsv",
                  "--cluster-min-reads", "1", *CFG_FLAGS, cwd=d)
    assert out["alignments"] == len(mapped)


def test_cli_twopass_on_combined(workdir):
    """Profile-aware realignment over the combined reference — the composed
    BASELINE configs 2+3 production flow (VERDICT r2 missing #2)."""
    d = workdir
    run_cli("combine", d / "ref.fa", d / "ann.tsv", d / "cidx2", *CFG_FLAGS,
            cwd=d)
    run_cli("simulate", d / "cidx2", d / "creads2.fastq", "--n-reads", "400",
            "--tc-rate", "0.1", *CFG_FLAGS, cwd=d)
    out = run_cli("twopass", d / "cidx2", d / "creads2.fastq", d / "ctp.sam",
                  *CFG_FLAGS, cwd=d)
    assert out["reads"] == 400
    assert out["profiled_reads"] > 250
    assert Path(out["profile"]).exists()
    # pass-1 SAM, learned profile, and pass-2 SAM all exist; pass-2 records
    # stay in genome coordinates with junction CIGARs preserved
    assert (d / "ctp.sam.pass1.sam").exists()
    recs = [l.split("\t") for l in (d / "ctp.sam").read_text().splitlines()
            if not l.startswith("@")]
    mapped = [r for r in recs if r[1] != "4"]
    assert len(mapped) > 300
    assert all(not r[2].startswith("tx::") for r in mapped)
    assert any("N" in r[5] for r in mapped)
    # the learned profile is loadable and T->C-heavy (simulated at 20%)
    from parasuite_tpu.errormodel.infer import ErrorProfile

    prof = ErrorProfile.load(out["profile"])
    assert prof.counts[:, 3, 1].sum() > 0  # T->C cells populated


def test_cli_dist_align_combined_file_mode(workdir):
    """File-side dist-align shards + merge work on a combined index."""
    d = workdir
    for h in range(2):
        run_cli("dist-align", d / "cidx", d / "creads.fastq", d / "dshard",
                "--host-index", str(h), "--n-hosts", "2", *CFG_FLAGS, cwd=d)
    out = run_cli("merge-shards", d / "cidx", d / "dshard", d / "dmerged.sam",
                  "--n-hosts", "2", "--pg-cl", "x", *CFG_FLAGS, cwd=d)
    assert out["records"] == 120
    # merged SAM equals the single-process align output record-for-record
    single = [l for l in (d / "cout.sam").read_text().splitlines()
              if not l.startswith("@")]
    merged = [l for l in (d / "dmerged.sam").read_text().splitlines()
              if not l.startswith("@")]
    assert merged == single


def test_cli_combined_xa_works_and_coordinator_runs(workdir):
    d = workdir
    if not (d / "cidx.ref.json").exists():  # standalone-run support
        (d / "ann.tsv").write_text("txA\tchrA\t+\t1200,2400\t1500,2700\n")
        run_cli("combine", d / "ref.fa", d / "ann.tsv", d / "cidx",
                *CFG_FLAGS, cwd=d)
        run_cli("simulate", d / "cidx", d / "creads.fastq", "--n-reads",
                "8", *CFG_FLAGS, cwd=d)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"

    # --xa on a combined index is supported since round 4 (VERDICT r3
    # missing #5): the run must succeed and emit a SAM in genome space
    p = subprocess.run([sys.executable, "-m", "parasuite_tpu.cli", "align",
                        str(d / "cidx"), str(d / "creads.fastq"),
                        str(d / "cxa.sam"), "--xa", *CFG_FLAGS],
                       capture_output=True, text=True, cwd=d, env=env,
                       timeout=300)
    assert p.returncode == 0, p.stderr
    assert (d / "cxa.sam").exists()
    recs = [l for l in (d / "cxa.sam").read_text().splitlines()
            if not l.startswith("@")]
    # creads.fastq is made by an earlier test when the module runs whole
    # (120 reads) or freshly here (8); either way: records out, genome space
    assert len(recs) in (8, 120) and all("tx::" not in l for l in recs)

    # coordinator SPMD mode supports combined indexes since round 5
    # (VERDICT r4 missing #4): the candidate table shards with the reads
    out = run_cli("dist-align", d / "cidx", d / "creads.fastq", d / "coord",
                  "--coordinator", "127.0.0.1:12399", "--num-processes", "1",
                  "--process-id", "0", *CFG_FLAGS, cwd=d)
    assert out["mode"] == "jax.distributed"
    out = run_cli("merge-shards", d / "cidx", d / "coord", d / "coord.sam",
                  "--n-hosts", "1", "--pg-cl", "x", *CFG_FLAGS, cwd=d)
    assert out["records"] == len(recs)
    got = [l for l in (d / "coord.sam").read_text().splitlines()
           if not l.startswith("@")]
    # coordinator output matches the plain align records (sans XA tags:
    # cxa.sam carries them, the coordinator run does not) when the module
    # ran whole; standalone it still aligned everything in genome space
    assert len(got) == len(recs) and all("tx::" not in l for l in got)
