from ldpc_tpu.parallel.mesh import (
    batch_sharding,
    distributed_init,
    make_mesh,
    replicated,
)
from ldpc_tpu.parallel.montecarlo import (make_spmd_two_checkpoint_stats_fn,
                                          make_spmd_wave_fn)
