from ultrazoom_tpu.metrics.gan import RelativisticF1
from ultrazoom_tpu.metrics.quality import psnr, ssim, vif

__all__ = ["RelativisticF1", "psnr", "ssim", "vif"]
