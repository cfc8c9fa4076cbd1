"""Device-mesh parallelism.

The reference is single-process/single-GPU (SURVEY.md §2.12); here
multi-chip scaling is first-class: a named `jax.sharding.Mesh` with
`data` (stereo pairs / epochs / tiles) and `model` (attention heads)
axes, sharded matcher steps via pjit, and XLA collectives over ICI.
"""

from icepy4d_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
from icepy4d_tpu.parallel.epoch_step import (  # noqa: F401
    make_sharded_match_step,
    make_sharded_nn_step,
)
from icepy4d_tpu.parallel.ring_attention import (  # noqa: F401
    make_ring_attention,
)
from icepy4d_tpu.parallel.lightglue_sp import (  # noqa: F401
    make_sequence_parallel_lightglue,
)
from icepy4d_tpu.parallel.superglue_sp import (  # noqa: F401
    make_sequence_parallel_superglue,
)
from icepy4d_tpu.parallel.lightglue_pp import (  # noqa: F401
    make_pipeline_parallel_lightglue,
)
from icepy4d_tpu.parallel.loftr_pp import (  # noqa: F401
    make_pipeline_parallel_loftr_coarse,
)
from icepy4d_tpu.parallel.staged import (  # noqa: F401
    StagedPipeline,
    split_devices,
)
from icepy4d_tpu.parallel.distributed import (  # noqa: F401
    EpochShard,
    all_gather_host,
    global_mesh,
    init_distributed,
    partition_epochs,
)
