from ultrazoom_tpu.data.augment import AugmentConfig, augment
from ultrazoom_tpu.data.datasets import ImageFolder, ImagePairs
from ultrazoom_tpu.data.degradations import DegradationConfig, degrade
from ultrazoom_tpu.data.loader import BatchLoader

__all__ = [
    "AugmentConfig",
    "augment",
    "ImageFolder",
    "ImagePairs",
    "DegradationConfig",
    "degrade",
    "BatchLoader",
]
