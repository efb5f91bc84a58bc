from sparse_caption_tpu.scst.scorers import CaptionScorer  # noqa: F401
