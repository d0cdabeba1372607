from parasuite_tpu.ops.device_index import DeviceIndex, ScoreParams  # noqa: F401
from parasuite_tpu.ops.aligner import align_batch, AlignResult  # noqa: F401
from parasuite_tpu.ops.profile_update import profile_counts_batch  # noqa: F401
