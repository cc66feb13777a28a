from ultrazoom_tpu.ops.conv import conv2d
from ultrazoom_tpu.ops.pad import crop_or_pad_to
from ultrazoom_tpu.ops.resize import resize2d, upsample2d, resize_matrix
from ultrazoom_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

__all__ = [
    "conv2d",
    "crop_or_pad_to",
    "resize2d",
    "upsample2d",
    "resize_matrix",
    "pixel_shuffle",
    "pixel_unshuffle",
]
