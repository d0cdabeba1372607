"""Reference packing + k-mer index (SURVEY.md §2 components 5-6)."""

import numpy as np

from parasuite_tpu.index import KmerIndex, PackedReference
from parasuite_tpu.index.kmer import kmer_codes
from parasuite_tpu.utils.dna import encode_seq


def test_packed_reference_layout(tiny_ref, small_cfg):
    sp = small_cfg.chrom_spacer
    assert tiny_ref.starts[0] == sp
    assert tiny_ref.ends[0] - tiny_ref.starts[0] == 5000
    assert tiny_ref.starts[1] == tiny_ref.ends[0] + sp
    # spacers are N
    assert np.all(tiny_ref.seq[:sp] == 4)
    assert np.all(tiny_ref.seq[tiny_ref.ends[0]:tiny_ref.starts[1]] == 4)


def test_locate(tiny_ref):
    ci, local = tiny_ref.locate(np.asarray([tiny_ref.starts[0],
                                            tiny_ref.starts[1] + 10,
                                            5]))
    assert list(ci) == [0, 1, -1]
    assert local[0] == 0 and local[1] == 10


def test_kmer_codes():
    seq = encode_seq("ACGTN")
    codes, valid = kmer_codes(seq, 2)
    # AC=0*4+1=1, CG=6, GT=11, TN invalid
    np.testing.assert_array_equal(codes[:3], [1, 6, 11])
    np.testing.assert_array_equal(valid, [True, True, True, False])


def test_index_lookup_exhaustive(tiny_ref, small_cfg):
    """Every bucket's positions match a brute-force scan."""
    k = small_cfg.kmer_size
    idx = KmerIndex.build(tiny_ref.seq, k)
    codes, valid = kmer_codes(tiny_ref.seq, k)
    assert idx.n_kmers == int(valid.sum())
    rng = np.random.default_rng(7)
    # check some occupied + some random codes
    pos_all = np.nonzero(valid)[0]
    some = list(rng.choice(pos_all, size=20))
    for p in some:
        code = int(codes[p])
        hits = idx.lookup(code)
        expect = pos_all[codes[pos_all] == code]
        np.testing.assert_array_equal(hits, expect)
        assert np.all(np.diff(hits) > 0)  # ascending => deterministic


def test_index_save_load(tiny_ref, small_cfg, tmp_path):
    idx = KmerIndex.build(tiny_ref.seq, small_cfg.kmer_size)
    idx.save(tmp_path / "t")
    back = KmerIndex.load(tmp_path / "t")
    assert back.k == idx.k
    np.testing.assert_array_equal(back.positions, idx.positions)
    np.testing.assert_array_equal(back.bucket_starts, idx.bucket_starts)

    tiny_ref.save(tmp_path / "t")
    ref2 = PackedReference.load(tmp_path / "t")
    np.testing.assert_array_equal(ref2.seq, tiny_ref.seq)
    assert ref2.names == tiny_ref.names
