from ultrazoom_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    latest_meta,
    restore_params_only,
    restore_state,
    save_state,
)
from ultrazoom_tpu.utils.logging import ScalarLogger

__all__ = [
    "AsyncCheckpointer",
    "latest_meta",
    "restore_params_only",
    "restore_state",
    "save_state",
    "ScalarLogger",
]
