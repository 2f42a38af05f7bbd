from .mesh import make_mesh, shard_batched_mats, sharded_batch_solve  # noqa: F401
from .sharded import ShardedSCS  # noqa: F401
from .sharded_cg import sharded_cg_solve, sharded_normal_matvec  # noqa: F401
