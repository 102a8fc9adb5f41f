"""Device-mesh parallelism: dp x tp meshes, shardings, jitted train steps."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    params_shardings,
    put_global_batch,
    put_global_tree,
    replicate_tree,
    replicated,
    shard_full_batch,
    state_shardings,
)
