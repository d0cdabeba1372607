from parasuite_tpu.sim.generate import (  # noqa: F401
    SimTruth,
    simulate_reads,
    simulate_binding_sites,
)
