"""Dataset registry (parity: reference ``sparse_caption/data/__init__.py:26-67``)."""

from sparse_caption_tpu.registry import Registry

DATASET_REGISTRY: Registry = Registry("dataset")
register_dataset = DATASET_REGISTRY.register


def get_dataset(name: str):
    DATASET_REGISTRY.import_all("sparse_caption_tpu.data")
    return DATASET_REGISTRY.get(name.lower())


from sparse_caption_tpu.data.karpathy import KarpathyDataset  # noqa: E402,F401
