"""Repeat-structured genome synthesizer (sim/genome.py; VERDICT r4
next-round #1's measurement substrate — determinism and census sanity)."""

import numpy as np

from parasuite_tpu.sim.genome import (GenomeStats, chr22_like, multi_chrom,
                                      synth_chromosome)


def test_chr22_like_deterministic_and_census():
    s1, st1 = chr22_like(scale=0.01)
    s2, st2 = chr22_like(scale=0.01)
    np.testing.assert_array_equal(s1["chr22s"], s2["chr22s"])
    seq = s1["chr22s"]
    assert seq.shape[0] == 510_000
    # leading N block present, sized with scale
    assert (seq[:103_000] == 4).all()
    assert (seq >= 0).all() and (seq <= 4).all()
    # repeat fraction sane; at tiny scale the min-1 segdup block (50-200kb)
    # dominates, so the upper bound is loose (full-scale measured 0.155)
    assert 0.10 < st1.repeat_fraction < 0.60
    assert set(st1.family_bases) >= {"SINE_alu", "LINE_l1", "LTR_erv",
                                     "satellite", "segdup"}


def test_multi_chrom_shapes_and_gaps():
    seqs, stats = multi_chrom(2_000_000, 4, seed=3)
    assert len(seqs) == 4
    assert all(v.shape[0] == 500_000 for v in seqs.values())
    assert stats.n_bases > 0  # internal gaps planted
    assert 0.02 < stats.repeat_fraction < 0.5
    # deterministic
    seqs2, _ = multi_chrom(2_000_000, 4, seed=3)
    for k in seqs:
        np.testing.assert_array_equal(seqs[k], seqs2[k])


def test_synth_chromosome_repeats_are_real_copies():
    """Planted copies must actually correlate: with a 300bp consensus pasted
    many times, SOME 50-mer occurs at far more sites than iid background
    would allow."""
    st = GenomeStats()
    seq = synth_chromosome(400_000, seed=11, stats=st)
    from parasuite_tpu.index.kmer import KmerIndex

    ix = KmerIndex.build(seq, 12)
    occ = np.diff(ix.bucket_starts.astype(np.int64))
    # iid-only: P(bucket > 20) at occupancy 400k/16.7M ~ 0.024 is ~0;
    # repeat families push the max far beyond
    assert int(occ.max()) > 20
