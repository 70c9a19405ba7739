from .mesh import (DataParallel, make_mesh, shard_batch, replicate,
                   process_is_main, init_distributed)

__all__ = ["DataParallel", "make_mesh", "shard_batch", "replicate",
           "process_is_main", "init_distributed"]
