from bubbleformer_tpu.data.dataset import BubbleForecast
from bubbleformer_tpu.data.pipeline import DataLoader, synthetic_batch

__all__ = ["BubbleForecast", "DataLoader", "synthetic_batch"]
