from parasuite_tpu.benchkit.evaluate import evaluate_against_truth, EvalReport  # noqa: F401
from parasuite_tpu.benchkit.timing import ThroughputTimer  # noqa: F401
from parasuite_tpu.benchkit.scaling import measure_scaling  # noqa: F401
