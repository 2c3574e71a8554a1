from ldpc_tpu.sim.importance import (
    FloorEstimate,
    biased_awgn_llr,
    estimate_event_probability,
    estimate_trapping_floor,
)
from ldpc_tpu.sim.montecarlo import (
    LDPCSimulator,
    SimulationConfig,
    SimulationResult,
    create_test_decoders,
    simulate_single_snr,
)
