from sparse_caption_tpu.decoding.penalties import penalty_fn  # noqa: F401
from sparse_caption_tpu.decoding.sample import sample_decode  # noqa: F401
from sparse_caption_tpu.decoding.beam import beam_search  # noqa: F401
from sparse_caption_tpu.decoding.api import generate  # noqa: F401
