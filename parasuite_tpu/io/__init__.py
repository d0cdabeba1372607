from parasuite_tpu.io.fasta import read_fasta, write_fasta  # noqa: F401
from parasuite_tpu.io.fastq import read_fastq, write_fastq, iter_fastq_batches  # noqa: F401
from parasuite_tpu.io.batch import ReadBatch  # noqa: F401
