from .mesh import (make_mesh, shard_batch, sharded_extend_step,
                   sharded_seed_step)

__all__ = ["make_mesh", "shard_batch", "sharded_extend_step",
           "sharded_seed_step"]
