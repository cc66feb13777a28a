"""Torch reconstruction of the Ctrl architecture for ONNX deployment.

The reference snapshot does not contain the 0.2.x "control" model source
(SURVEY.md section 0.1) — only the published checkpoints and the eval/export
surfaces prove its graph.  models/ctrl.py is our JAX reconstruction; this
module is the same graph as a ``torch.nn.Module`` so that Ctrl-family
exports can ride the reference's deployment story, ONNX + ONNX Runtime
(reference export_model.ipynb cell-9: ONNX inputs are ``(x, c)`` for this
generation; README.md:181-185).

The module is built FROM our torch-flat export layout (export/hf.py keys:
``stem.conv.{weight,bias}``, ``body.{i}.conv1.weight``,
``body.{i}.film.{weight,bias}``, ``body.{i}.conv2.weight``,
``tail.conv.weight``), i.e. from an HF-style save_pretrained directory, and
its forward is numerically the torch twin of models/ctrl.apply (bicubic
a=-0.75 skip, FiLM before SiLU, pixel-shuffle tail, clamp in the wrapper).
"""

from __future__ import annotations

import json
import pathlib

__all__ = ["build_torch_ctrl", "OnnxCtrlModel", "load_torch_ctrl_pretrained"]


def build_torch_ctrl(cfg_dict: dict):
    """Construct an uninitialised torch Ctrl model from a config dict
    (models/ctrl.MewZoomCtrlConfig.to_dict layout)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    c = cfg_dict["num_channels"]
    h = c * cfg_dict.get("hidden_ratio", 2)
    layers = cfg_dict["num_layers"]
    ratio = cfg_dict["upscale_ratio"]
    controllable = cfg_dict.get("controllable", True)
    nf = cfg_dict.get("num_control_features", 3)

    class _Wrap(nn.Module):
        """Single-child wrapper so state-dict keys match export/hf.py's
        ``stem.conv.weight`` / ``tail.conv.weight`` layout."""

        def __init__(self, conv):
            super().__init__()
            self.conv = conv

        def forward(self, x):
            return self.conv(x)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(c, h, 3, padding=1, bias=False)
            if controllable:
                self.film = nn.Linear(nf, 2 * h)
            self.conv2 = nn.Conv2d(h, c, 3, padding=1, bias=False)

        def forward(self, z, cv):
            hzn = self.conv1(z)
            if controllable:
                gamma, beta = self.film(cv).chunk(2, dim=-1)
                hzn = hzn * (1.0 + gamma[:, :, None, None]) + beta[:, :, None, None]
            return z + self.conv2(F.silu(hzn))

    class TorchCtrl(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = _Wrap(nn.Conv2d(3, c, 1))
            self.body = nn.ModuleList([Block() for _ in range(layers)])
            self.tail = _Wrap(nn.Conv2d(c, 3 * ratio**2, 3, padding=1, bias=False))
            self.upscale_ratio = ratio
            self.controllable = controllable

        def forward(self, x, cv=None):
            s = F.interpolate(x, scale_factor=ratio, mode="bicubic")
            z = self.stem(x)
            if self.controllable and cv is None:
                cv = torch.zeros(x.shape[0], nf, dtype=x.dtype, device=x.device)
            for b in self.body:
                z = b(z, cv)
            return s + F.pixel_shuffle(self.tail(z), ratio)

        def upscale(self, x, cv=None):
            with torch.inference_mode():
                return self.forward(x, cv).clamp(0.0, 1.0)

    return TorchCtrl()


def load_torch_ctrl_pretrained(model_path):
    """HF-style export dir (config.json + torch-flat model.safetensors) ->
    eval'd torch Ctrl model.  Strict load: every checkpoint key must land."""
    from safetensors.torch import load_file

    model_path = pathlib.Path(model_path)
    config = json.loads((model_path / "config.json").read_text())
    config.pop("architecture", None)
    model = build_torch_ctrl(config)
    sd = load_file(str(model_path / "model.safetensors"))
    model.load_state_dict(sd, strict=True)
    model.eval()
    return model, config


def OnnxCtrlModel(model):
    """Export wrapper putting the [0,1] clamp in the ONNX graph and fixing
    the (x, c) two-input interface of the reference's 0.2.x ONNX artifacts
    (export_model.ipynb cell-9, README.md:181-185).  For non-controllable
    models the exported graph takes only ``x``."""
    import torch.nn as nn

    if model.controllable:

        class _OnnxCtrl(nn.Module):
            def __init__(self, m):
                super().__init__()
                self.model = m

            def forward(self, x, c):
                return self.model(x, c).clamp(0.0, 1.0)

    else:

        class _OnnxCtrl(nn.Module):
            def __init__(self, m):
                super().__init__()
                self.model = m

            def forward(self, x):
                return self.model(x).clamp(0.0, 1.0)

    return _OnnxCtrl(model)
