from ultrazoom_tpu.models import ctrl, unet
from ultrazoom_tpu.models.api import MewZoom, MewZoomCtrl, from_pretrained
from ultrazoom_tpu.models.ctrl import ControlVector, MewZoomCtrlConfig
from ultrazoom_tpu.models.unet import MewZoomConfig

__all__ = [
    "ctrl",
    "unet",
    "MewZoom",
    "MewZoomCtrl",
    "from_pretrained",
    "ControlVector",
    "MewZoomCtrlConfig",
    "MewZoomConfig",
]
