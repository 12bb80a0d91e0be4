from .batching import MolBatch, MolFeatures, collate, pad_batch, bucket_size
from .preprocessing import (
    PreprocessingConfig,
    SAENormalizer,
    StandardScaler,
    PreprocessingPipeline,
    preprocess_molecular_data,
)

__all__ = [
    "MolBatch",
    "MolFeatures",
    "collate",
    "pad_batch",
    "bucket_size",
    "PreprocessingConfig",
    "SAENormalizer",
    "StandardScaler",
    "PreprocessingPipeline",
    "preprocess_molecular_data",
]
