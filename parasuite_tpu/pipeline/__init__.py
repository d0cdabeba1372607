from parasuite_tpu.pipeline.align import AlignerEngine, HostAlignments  # noqa: F401
from parasuite_tpu.pipeline.two_pass import two_pass_align  # noqa: F401
from parasuite_tpu.pipeline.clusters import call_clusters, Cluster  # noqa: F401
from parasuite_tpu.pipeline.combined import (  # noqa: F401
    CombinedEngine,
    CombinedReference,
    Transcript,
    project_to_genome,
)
