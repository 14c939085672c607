"""Device-mesh parallelism: ray-axis sharding over ICI/DCN.

The reference's only parallelism was single-process ``nn.DataParallel``
(SURVEY.md §2.6). Here every batch axis (rays, image patches) is sharded
over a `jax.sharding.Mesh` and params are replicated; XLA inserts the
collectives (psum of grads, all-gather of image tiles) over ICI.
"""

from tgtc.parallel.mesh import (
    get_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = ["get_mesh", "data_sharding", "replicated_sharding", "shard_batch"]
