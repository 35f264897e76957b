"""Device meshes and sharding rules (DP × TP via jax.sharding + pjit)."""

from mmtg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    shard_batch,
    shard_params,
)
