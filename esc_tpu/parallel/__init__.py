from .mesh import (DataParallel, make_mesh, shard_batch, replicate,
                   process_is_main)

__all__ = ["DataParallel", "make_mesh", "shard_batch", "replicate",
           "process_is_main"]
