"""High-level object API mirroring the reference's public surface.

Wraps the functional cores (models/unet.py, models/ctrl.py) in classes with
the method names users of the reference expect (``from_pretrained``,
``upscale``, ``predict_degradation``, ``add_weight_norms``,
``add_lora_adapters``, ``remove_parameterizations``, ``num_params`` —
reference src/ultrazoom/model.py:43-192), while staying thin: all state is
an explicit (cfg, params) pair and every compute path is jitted.

Input images are NHWC float in [0, 1] (TPU-native layout).  NCHW torch-style
arrays are auto-transposed when unambiguous (shape[1] == 3 != shape[3]).
"""

from __future__ import annotations

import pathlib
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.convert.torch_import import torch_state_dict_to_tree
from ultrazoom_tpu.engine.batching import dispatch_batched
from ultrazoom_tpu.engine.ensemble import make_self_ensemble
from ultrazoom_tpu.engine.infer import TiledUpscaler
from ultrazoom_tpu.export import hf
from ultrazoom_tpu.models import ctrl as _ctrl
from ultrazoom_tpu.models import unet as _unet
from ultrazoom_tpu.nn import transforms as _tr

__all__ = ["MewZoom", "MewZoomCtrl", "from_pretrained"]


def _ensure_nhwc(x) -> jax.Array:
    x = jnp.asarray(x)
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if x.shape[1] == 3 and x.shape[-1] != 3:
        x = jnp.transpose(x, (0, 2, 3, 1))
    return x, squeeze


def _count(tree) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


class _Base:
    ARCH: str = ""

    def __init__(self, cfg, params):
        self.cfg = cfg
        self.params = params
        self._cache: dict[Any, Any] = {}

    # -- reference-parity conveniences ------------------------------------

    @property
    def num_params(self) -> int:
        return _count(self.params)

    @property
    def num_trainable_params(self) -> int:
        return _count(self.params)

    def add_weight_norms(self) -> None:
        self.params = _tr.add_weight_norm(self.params)
        self._cache.clear()

    def add_lora_adapters(self, rank: int, alpha: float, seed: int = 0) -> None:
        self.params = _tr.add_lora(self.params, rank, alpha, jax.random.key(seed))
        self._cache.clear()

    def remove_parameterizations(self) -> None:
        self.params = _tr.materialize(self.params)
        self._cache.clear()

    # -- persistence -------------------------------------------------------

    def save_pretrained(self, path, dtype: str | None = None) -> None:
        """HF-style export (config.json + torch-layout model.safetensors).
        ``dtype="bfloat16"`` halves the artifact size."""
        params = _tr.materialize(self.params)
        flat = self._to_torch_flat(params)
        config = {**self.cfg.to_dict(), "architecture": self.ARCH}
        hf.save_pretrained(path, flat, config, dtype=dtype)

    def push_to_hub(self, repo_id: str, private: bool = False, **kw) -> None:
        """Upload to the HuggingFace Hub (reference
        ``PyTorchModelHubMixin.push_to_hub`` analog).  Requires network and
        ``huggingface_hub``; raises a clear error in air-gapped setups."""
        import tempfile

        try:
            from huggingface_hub import HfApi
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "push_to_hub requires the huggingface_hub package."
            ) from e
        with tempfile.TemporaryDirectory() as tmp:
            self.save_pretrained(tmp)
            api = HfApi()
            api.create_repo(repo_id, private=private, exist_ok=True, **kw)
            api.upload_folder(repo_id=repo_id, folder_path=tmp)

    def _to_torch_flat(self, params):
        return hf.tree_to_torch_flat(params)


class MewZoom(_Base):
    """The 0.3.0 U-Net flagship (QA head, ratios {2, 4, 8})."""

    ARCH = "mewzoom-unet"
    Config = _unet.MewZoomConfig

    @classmethod
    def from_config(
        cls, cfg: _unet.MewZoomConfig | dict | None = None, seed: int = 0, **kw
    ) -> "MewZoom":
        if cfg is None:
            cfg = _unet.MewZoomConfig(**kw)
        elif isinstance(cfg, dict):
            cfg = _unet.MewZoomConfig.from_dict(cfg)
        params = _unet.init(jax.random.key(seed), cfg)
        return cls(cfg, params)

    @classmethod
    def from_pretrained(cls, path, fold: bool = True) -> "MewZoom":
        config, params, _ = hf.load_pretrained_tree(path, fold=fold)
        return cls(_unet.MewZoomConfig.from_dict(config), params)

    @classmethod
    def from_torch_checkpoint(cls, path, fold: bool = True) -> "MewZoom":
        """Load a reference training checkpoint (.pt).

        Handles both key schemas in the reference repo: pretrain/fine-tune
        write ``upscaler``/``upscaler_args`` (pretrain.py:334-344) while the
        eval/export tooling expects ``model``/``model_args`` (validate.py:53).
        """
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("upscaler", ckpt.get("model"))
        args = ckpt.get("upscaler_args", ckpt.get("model_args"))
        lora_args = ckpt.get("lora_args") or {}
        params, _ = torch_state_dict_to_tree(
            sd, fold=fold, lora_alpha=lora_args.get("alpha")
        )
        return cls(_unet.MewZoomConfig.from_dict(args), params)

    # -- compute -----------------------------------------------------------

    def _jitted(self, name, compute_dtype):
        key = (name, compute_dtype)
        if key not in self._cache:
            mat = _tr.materialize(self.params)
            if name == "upscale_se":
                fn = make_self_ensemble(
                    partial(_unet.upscale, mat, cfg=self.cfg, compute_dtype=compute_dtype)
                )
            else:
                base = {
                    "forward": _unet.apply,
                    "upscale": _unet.upscale,
                    "qa": _unet.predict_degradation,
                }[name]
                fn = partial(base, mat, cfg=self.cfg, compute_dtype=compute_dtype)
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def forward(self, x, compute_dtype=None):
        x, squeeze = _ensure_nhwc(x)
        sr, qa = self._jitted("forward", compute_dtype)(x)
        return (sr[0], qa[0]) if squeeze else (sr, qa)

    def upscale(
        self, x, compute_dtype=None, tile: int | None = None,
        batch_dispatch: bool = True, self_ensemble: bool = False, **tile_kw,
    ):
        """SR inference; pass ``tile=`` to stream large images through the
        fixed-shape overlap-tile engine.  ``batch_dispatch`` decomposes
        intermediate batch sizes into known-fast anchor shapes
        (engine/batching.py) — disable to force one graph per batch size.
        ``self_ensemble`` averages the x8 geometric TTA views
        (engine/ensemble.py; ~8x FLOPs for the classic ~0.1-0.2 dB gain)."""
        x, squeeze = _ensure_nhwc(x)
        if tile is not None:
            eng = self.tiled(
                tile=tile, compute_dtype=compute_dtype,
                self_ensemble=self_ensemble, **tile_kw,
            )
            out = eng(np.asarray(x))
            return out[0] if squeeze else out
        if tile_kw:
            # **tile_kw exists only for the tiled engine; swallowing a
            # misspelled kwarg here (e.g. control=) would silently change
            # model behaviour instead of erroring.
            raise TypeError(
                f"upscale() got unexpected arguments {sorted(tile_kw)}; "
                "tile-engine options require tile=."
            )
        fn = self._jitted("upscale_se" if self_ensemble else "upscale", compute_dtype)
        out = dispatch_batched(fn, x) if batch_dispatch else fn(x)
        return out[0] if squeeze else out

    def predict_degradation(self, x, compute_dtype=None):
        x, squeeze = _ensure_nhwc(x)
        qa = self._jitted("qa", compute_dtype)(x)
        return qa[0] if squeeze else qa

    # Reference method name kept (typo and all) for drop-in compatibility.
    predict_degredation = predict_degradation

    def tiled(
        self, tile=256, overlap=16, tile_batch=8, mesh=None, compute_dtype=None,
        **engine_kw,
    ):
        mat = _tr.materialize(self.params)
        fn = partial(_unet.upscale, mat, cfg=self.cfg, compute_dtype=compute_dtype)
        return TiledUpscaler(
            fn, self.cfg.upscale_ratio, tile, overlap, tile_batch, mesh, **engine_kw
        )

    def serve(
        self, tile=256, overlap=16, tile_batch=8, max_wait_ms=5.0,
        compute_dtype=None, output_dtype="float32", call_timeout_s=None,
        self_ensemble=False,
    ):
        """Dynamic-batching serving handle (engine/serve.py): concurrent
        requests of any size share fixed-shape device batches.
        ``output_dtype="uint8"`` quantises on device — 4x less D2H (the
        dominant cost for large outputs).  ``call_timeout_s`` bounds one
        device step; on breach all futures fail and the service closes."""
        from ultrazoom_tpu.engine.serve import UpscaleService

        mat = _tr.materialize(self.params)
        fn = partial(_unet.upscale, mat, cfg=self.cfg, compute_dtype=compute_dtype)
        return UpscaleService(
            fn, self.cfg.upscale_ratio, tile, overlap, tile_batch, max_wait_ms,
            output_dtype=output_dtype, call_timeout_s=call_timeout_s,
            self_ensemble=self_ensemble,
        )


class MewZoomCtrl(_Base):
    """The controllable flat-body architecture (0.1.x/0.2.x reconstruction,
    ratios {2, 3, 4}); see models/ctrl.py."""

    ARCH = "mewzoom-ctrl"
    Config = _ctrl.MewZoomCtrlConfig
    ControlVector = _ctrl.ControlVector

    @classmethod
    def from_config(
        cls, cfg: _ctrl.MewZoomCtrlConfig | dict | None = None, seed: int = 0, **kw
    ) -> "MewZoomCtrl":
        if cfg is None:
            cfg = _ctrl.MewZoomCtrlConfig(**kw)
        elif isinstance(cfg, dict):
            cfg = _ctrl.MewZoomCtrlConfig.from_dict(cfg)
        params = _ctrl.init(jax.random.key(seed), cfg)
        return cls(cfg, params)

    @classmethod
    def from_preset(cls, name: str, seed: int = 0) -> "MewZoomCtrl":
        """Presets matching the published checkpoint table: "2x"/"3x"/"4x"."""
        return cls.from_config(_ctrl.PRESETS[name.lower()], seed=seed)

    @classmethod
    def from_pretrained(cls, path, fold: bool = True) -> "MewZoomCtrl":
        config, sd = hf.load_pretrained(path)
        cfg = _ctrl.MewZoomCtrlConfig.from_dict(config)
        params = _ctrl.torch_flat_to_params(sd, cfg)
        return cls(cfg, params)

    @classmethod
    def from_torch_state_dict(cls, state_dict, lora_alpha=None) -> "MewZoomCtrl":
        """Shape-driven import of ANY 0.1.x/0.2.x-era torch state dict —
        key names are ignored, the architecture is reconstructed from
        tensor shapes; weight-norm/LoRA parametrizations and ``_orig_mod.``
        prefixes are folded/stripped first (convert/ctrl_import.py)."""
        from ultrazoom_tpu.convert.ctrl_import import import_ctrl_state_dict

        params, cfg = import_ctrl_state_dict(state_dict, lora_alpha=lora_alpha)
        return cls(cfg, params)

    @classmethod
    def from_torch_checkpoint(cls, path) -> "MewZoomCtrl":
        """Load a 0.2.x-era .pt checkpoint (``model``/``model_args`` key
        schema, validate.py:51-57) via the shape-driven importer."""
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt.get("upscaler", ckpt))
        lora_args = ckpt.get("lora_args") or {}
        return cls.from_torch_state_dict(sd, lora_alpha=lora_args.get("alpha"))

    def _to_torch_flat(self, params):
        return _ctrl.params_to_torch_flat(params, self.cfg)

    def _jitted(self, compute_dtype):
        key = ("upscale", compute_dtype)
        if key not in self._cache:
            mat = _tr.materialize(self.params)
            self._cache[key] = jax.jit(
                partial(_ctrl.upscale, mat, cfg=self.cfg, compute_dtype=compute_dtype)
            )
        return self._cache[key]

    def _jitted_se(self, compute_dtype):
        key = ("upscale_se", compute_dtype)
        if key not in self._cache:
            mat = _tr.materialize(self.params)

            def fn(x, c):
                # The ensemble wrapper widens the batch (8B square / 4B+4B
                # otherwise); the per-image control rows ride along tiled.
                def inner(xt):
                    cc = (
                        None
                        if c is None
                        else jnp.tile(c, (xt.shape[0] // x.shape[0], 1))
                    )
                    return _ctrl.upscale(
                        mat, xt, cc, cfg=self.cfg, compute_dtype=compute_dtype
                    )

                return make_self_ensemble(inner)(x)

            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def upscale(
        self, x, c=None, compute_dtype=None, tile: int | None = None,
        batch_dispatch: bool = True, self_ensemble: bool = False, **tile_kw,
    ):
        if isinstance(c, dict):
            c = _ctrl.ControlVector(**c)  # validates field names and ranges
        if isinstance(c, _ctrl.ControlVector):
            c = c.to_tensor()
        x, squeeze = _ensure_nhwc(x)
        if self.cfg.controllable:
            if c is None:
                c = jnp.zeros((x.shape[0], 3), jnp.float32)
            c = jnp.atleast_2d(jnp.asarray(c, jnp.float32))
            if c.shape[0] == 1:
                c = jnp.broadcast_to(c, (x.shape[0], 3))
        if tile is not None:
            eng = self.tiled(
                c=c, tile=tile, compute_dtype=compute_dtype,
                self_ensemble=self_ensemble, **tile_kw,
            )
            out = eng(np.asarray(x))
            return out[0] if squeeze else out
        if tile_kw:
            raise TypeError(
                f"upscale() got unexpected arguments {sorted(tile_kw)}; "
                "tile-engine options require tile=."
            )
        fn = self._jitted_se(compute_dtype) if self_ensemble else self._jitted(compute_dtype)
        out = (
            dispatch_batched(lambda xx, cc: fn(xx, cc), x, c)
            if batch_dispatch
            else fn(x, c)
        )
        return out[0] if squeeze else out

    def test_compare(self, x, c=None, compute_dtype=None):
        """(enhanced, bicubic) pair — reference validate.py:97 API."""
        x, squeeze = _ensure_nhwc(x)
        enhanced, bicubic = _ctrl.test_compare(
            _tr.materialize(self.params), x, c, cfg=self.cfg, compute_dtype=compute_dtype
        )
        return (enhanced[0], bicubic[0]) if squeeze else (enhanced, bicubic)

    def serve(
        self, c=None, tile=256, overlap=16, tile_batch=8, max_wait_ms=5.0,
        compute_dtype=None, output_dtype="float32", call_timeout_s=None,
        self_ensemble=False,
    ):
        """Dynamic-batching serving handle with a fixed control vector
        (engine/serve.py).  ``output_dtype="uint8"`` quantises on device —
        4x less D2H.  ``call_timeout_s`` bounds one device step; on breach
        all futures fail and the service closes."""
        from ultrazoom_tpu.engine.serve import UpscaleService

        mat = _tr.materialize(self.params)
        if isinstance(c, _ctrl.ControlVector):
            c = c.to_tensor()

        def fn(x):
            cc = None
            if self.cfg.controllable:
                cv = (
                    jnp.zeros((1, 3), jnp.float32)
                    if c is None
                    else jnp.atleast_2d(jnp.asarray(c, jnp.float32))
                )
                cc = jnp.broadcast_to(cv[:1], (x.shape[0], 3))
            return _ctrl.upscale(mat, x, cc, cfg=self.cfg, compute_dtype=compute_dtype)

        return UpscaleService(
            fn, self.cfg.upscale_ratio, tile, overlap, tile_batch, max_wait_ms,
            output_dtype=output_dtype, call_timeout_s=call_timeout_s,
            self_ensemble=self_ensemble,
        )

    def tiled(
        self, c=None, tile=256, overlap=16, tile_batch=8, mesh=None,
        compute_dtype=None, **engine_kw,
    ):
        mat = _tr.materialize(self.params)
        if isinstance(c, _ctrl.ControlVector):
            c = c.to_tensor()

        def fn(x):
            cc = None
            if self.cfg.controllable:
                cv = jnp.zeros((1, 3), jnp.float32) if c is None else jnp.atleast_2d(jnp.asarray(c, jnp.float32))
                cc = jnp.broadcast_to(cv[:1], (x.shape[0], 3))
            return _ctrl.upscale(mat, x, cc, cfg=self.cfg, compute_dtype=compute_dtype)

        return TiledUpscaler(
            fn, self.cfg.upscale_ratio, tile, overlap, tile_batch, mesh, **engine_kw
        )


def _resolve_model_path(path):
    """Local directory, or (when network is available) a HF Hub repo id
    resolved via snapshot_download — mirroring the reference's
    ``from_pretrained("andrewdalpino/MewZoom-2X")`` UX."""
    p = pathlib.Path(path)
    if p.exists():
        return p
    try:
        from huggingface_hub import snapshot_download

        return pathlib.Path(snapshot_download(repo_id=str(path)))
    except Exception as e:
        raise FileNotFoundError(
            f"Model path {path!r} does not exist locally and could not be "
            f"fetched from the HuggingFace Hub ({type(e).__name__}: {e})."
        ) from e


def from_pretrained(path) -> MewZoom | MewZoomCtrl:
    """Architecture-dispatching loader: local HF-style dir or Hub repo id."""
    path = _resolve_model_path(path)
    config, _ = hf.load_pretrained(path)
    arch = config.get("architecture", "mewzoom-unet")
    if arch == "mewzoom-ctrl":
        return MewZoomCtrl.from_pretrained(path)
    return MewZoom.from_pretrained(path)
