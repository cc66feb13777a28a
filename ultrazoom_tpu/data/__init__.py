from ultrazoom_tpu.data.augment import AugmentConfig, augment
from ultrazoom_tpu.data.cached import (
    CachedImageFolder,
    assert_cache_matches,
    build_sample_cache,
    is_sample_cache,
)
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
    "CachedImageFolder",
    "assert_cache_matches",
    "build_sample_cache",
    "is_sample_cache",
]
