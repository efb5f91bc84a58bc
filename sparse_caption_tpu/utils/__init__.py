from sparse_caption_tpu.utils.misc import configure_logging, Timer  # noqa: F401
