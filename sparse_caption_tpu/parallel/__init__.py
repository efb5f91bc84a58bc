from sparse_caption_tpu.parallel.mesh import (  # noqa: F401
    global_put,
    make_mesh,
    opt_state_sharding,
    param_sharding,
    shard_batch,
    shard_state,
)
from sparse_caption_tpu.parallel import distributed  # noqa: F401
from sparse_caption_tpu.parallel.pipeline import (  # noqa: F401
    make_pipe_mesh,
    pipelined_decode_full,
    pipelined_decoder_stack,
)
