from sparse_caption_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    opt_state_sharding,
    param_sharding,
    shard_batch,
    shard_state,
)
from sparse_caption_tpu.parallel.pipeline import (  # noqa: F401
    make_pipe_mesh,
    pipelined_decode_full,
    pipelined_decoder_stack,
)
