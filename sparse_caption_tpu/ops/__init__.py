from sparse_caption_tpu.ops.ste import bernoulli_sample_sigmoid, rounding_sigmoid  # noqa: F401
from sparse_caption_tpu.ops.masked import MaskConfig, MaskedDense, MaskedEmbed  # noqa: F401
