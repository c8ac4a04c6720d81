r"""Device meshes, sharding rules and distributed sampling.

The reference is single-process single-device (no `torch.distributed` anywhere;
device placement is `Module.to(device)`, README.md:76). This package is the
TPU-native first-class replacement (SURVEY.md §2.8): `jax.sharding.Mesh`
construction over ICI/DCN, data-parallel sharding of sampler state, optional
tensor-parallel parameter shardings — XLA emits the collectives.
"""

from .mesh import (  # noqa: F401
    data_sharding,
    get_mesh,
    initialize_distributed,
    make_hybrid_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
from .batch import sample_sharded  # noqa: F401
from .pp import pipeline_blocks, stack_modules  # noqa: F401
from .recipes import flux_serving_shardings, pipeline_dit, serve_flux  # noqa: F401
from .ring import ring_attention, ring_attention_local  # noqa: F401
from .ulysses import ulysses_attention, ulysses_attention_local  # noqa: F401
from .tp import (  # noqa: F401
    DIT_TP_RULES,
    FLUX_TP_RULES,
    SANA_TP_RULES,
    SD_TP_RULES,
    fsdp_shardings,
    module_shardings,
    shard_module,
    shard_module_fsdp,
)
