from .chunked import decode_chunked_dp, encode_chunked_dp
from .mesh import (DataParallel, make_mesh, shard_batch, replicate,
                   process_is_main, init_distributed)

__all__ = ["DataParallel", "make_mesh", "shard_batch", "replicate",
           "process_is_main", "init_distributed",
           "encode_chunked_dp", "decode_chunked_dp"]
