from sparse_caption_tpu.metrics.eval import ALL_METRICS, evaluate_caption_json  # noqa: F401
