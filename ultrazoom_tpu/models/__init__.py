from ultrazoom_tpu.models import unet
from ultrazoom_tpu.models.unet import MewZoomConfig

__all__ = ["unet", "MewZoomConfig"]
