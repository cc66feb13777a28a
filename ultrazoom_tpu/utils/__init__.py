from ultrazoom_tpu.utils.checkpoint import latest_meta, restore_state, save_state
from ultrazoom_tpu.utils.logging import ScalarLogger

__all__ = ["latest_meta", "restore_state", "save_state", "ScalarLogger"]
