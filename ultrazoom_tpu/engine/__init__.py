from ultrazoom_tpu.engine.infer import TiledUpscaler

__all__ = ["TiledUpscaler"]
