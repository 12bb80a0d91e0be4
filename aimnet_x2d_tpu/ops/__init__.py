from .segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
]
