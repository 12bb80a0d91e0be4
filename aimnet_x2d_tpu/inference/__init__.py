from .engine import inference_main
from .pipeline import StreamingInferencePipeline

__all__ = ["inference_main", "StreamingInferencePipeline"]
