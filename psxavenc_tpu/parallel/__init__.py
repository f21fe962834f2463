from .mesh import (encode_step_sharded, make_mesh,  # noqa: F401
                   shard_batch)
