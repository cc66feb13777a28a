"""Test-time oracle: load the reference torch model from /root/reference.

Nothing from the reference is copied into this repo — this helper reads the
snapshot's ``model.py`` at test runtime and execs it with the one-line
construction bug patched (``qa_num_features`` -> ``num_deg_features``; the
snapshot raises NameError otherwise, see SURVEY.md section 0.1).  It exists
purely as a golden oracle for numerical parity tests and is skipped when the
snapshot is absent.
"""

from __future__ import annotations

import pathlib
import sys
import types

REFERENCE_MODEL = pathlib.Path("/root/reference/src/ultrazoom/model.py")


def reference_available() -> bool:
    if not REFERENCE_MODEL.exists():
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


_cache: types.ModuleType | None = None


def load_reference_model_module() -> types.ModuleType:
    """Exec the (patched) reference model.py in an isolated module."""
    global _cache
    if _cache is not None:
        return _cache

    src = REFERENCE_MODEL.read_text()
    # The snapshot's Encoder.__init__ asserts on an undefined name; patch the
    # name so the model is constructible (SURVEY.md section 0.1, BUG 1).
    src = src.replace("qa_num_features > 0", "num_deg_features > 0")

    # The HF mixin is irrelevant for the oracle; stub it if absent.
    try:
        import huggingface_hub  # noqa: F401
    except ImportError:
        stub = types.ModuleType("huggingface_hub")

        class PyTorchModelHubMixin:  # noqa: D401 - minimal stand-in
            pass

        stub.PyTorchModelHubMixin = PyTorchModelHubMixin
        sys.modules.setdefault("huggingface_hub", stub)

    mod = types.ModuleType("reference_ultrazoom_model")
    mod.__file__ = str(REFERENCE_MODEL)
    exec(compile(src, str(REFERENCE_MODEL), "exec"), mod.__dict__)
    _cache = mod
    return mod


TINY_ARGS = dict(
    upscale_ratio=2,
    primary_channels=8,
    primary_layers=2,
    secondary_channels=12,
    secondary_layers=2,
    tertiary_channels=16,
    tertiary_layers=2,
    quaternary_channels=24,
    quaternary_layers=2,
    hidden_ratio=2,
    num_deg_features=3,
)


def build_reference_mewzoom(seed: int = 0, **overrides):
    """Construct a (deterministic) reference MewZoom for golden comparison."""
    import torch

    mod = load_reference_model_module()
    torch.manual_seed(seed)
    args = {**TINY_ARGS, **overrides}
    model = mod.MewZoom(**args)
    model.eval()
    return model, args
