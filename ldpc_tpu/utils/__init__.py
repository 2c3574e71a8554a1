from ldpc_tpu.utils.cache import enable_compilation_cache
from ldpc_tpu.utils.checkpoint import (
    load_checkpoint,
    load_trainer_checkpoint,
    save_checkpoint,
    save_trainer_checkpoint,
)
from ldpc_tpu.utils.profiling import (
    ThroughputCounter,
    measure_throughput,
    trace,
)
