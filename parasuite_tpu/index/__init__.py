from parasuite_tpu.index.reference import PackedReference  # noqa: F401
from parasuite_tpu.index.kmer import KmerIndex, build_index  # noqa: F401
