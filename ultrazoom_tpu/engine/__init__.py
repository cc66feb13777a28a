from ultrazoom_tpu.engine.batching import dispatch_batched
from ultrazoom_tpu.engine.infer import TiledUpscaler
from ultrazoom_tpu.engine.serve import UpscaleService
from ultrazoom_tpu.engine.tiling import plan_tiles

__all__ = ["TiledUpscaler", "UpscaleService", "dispatch_batched", "plan_tiles"]
