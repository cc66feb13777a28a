"""Export CLI: training checkpoint -> HF directory (+ optional StableHLO).

Reference analog: export_model.ipynb — load checkpoint (+ optional LoRA),
fold parametrizations, ``save_pretrained``/``push_to_hub``, ONNX export
with a numeric parity gate.  Here: our trainer checkpoint -> HF-style
safetensors dir (loadable by BOTH this framework and the original torch
package) and optionally a StableHLO artifact with the same parity gate.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MewZoom-TPU model export")
    p.add_argument("--checkpoint_path", required=True, help="trainer ckpt dir")
    p.add_argument("--output_path", required=True, help="HF-style output dir")
    p.add_argument("--push_to_hub", default=None, help="optional HF repo id")
    p.add_argument(
        "--dtype", default="float32", choices=("float32", "bfloat16"),
        help="safetensors storage dtype; bfloat16 halves the artifact size "
        "(loaders upcast to f32 transparently)",
    )
    p.add_argument(
        "--stablehlo", default=None,
        help="also export a StableHLO artifact to this file",
    )
    p.add_argument("--stablehlo_size", type=int, default=256)
    p.add_argument("--stablehlo_batch", type=int, default=1)
    return p


def load_model_from_train_checkpoint(path):
    """Rebuild a MewZoom/MewZoomCtrl from a pretrain/finetune checkpoint
    directory (arch recorded in meta.json by the pretrain CLI)."""
    from ultrazoom_tpu.models import MewZoom, unet
    from ultrazoom_tpu.train.steps import GanTrainState, TrainState, make_optimizer
    from ultrazoom_tpu.utils import latest_meta, restore_state

    meta = latest_meta(path)
    assert meta is not None, f"no checkpoint at {path}"

    if meta.get("architecture") == "mewzoom-ctrl":
        from ultrazoom_tpu.models import MewZoomCtrl
        from ultrazoom_tpu.models import ctrl as _ctrl
        from ultrazoom_tpu.train.steps import wrap_params_with_loss_combiner
        from ultrazoom_tpu.utils import restore_params_only

        ccfg = _ctrl.MewZoomCtrlConfig.from_dict(meta["upscaler_args"])
        init_params = _ctrl.init(jax.random.key(0), ccfg)
        try:
            params = restore_params_only(path, init_params)
        except AssertionError:  # adaptive-loss layout (wrapped params)
            wrapped = wrap_params_with_loss_combiner(init_params, 3)
            params = restore_params_only(path, wrapped)["model"]
        return MewZoomCtrl(ccfg, params), meta

    cfg = unet.MewZoomConfig.from_dict(meta["upscaler_args"])
    params = unet.init(jax.random.key(0), cfg)
    opt = make_optimizer(1.0)

    if "critic_args" in meta:  # fine-tune checkpoint
        from ultrazoom_tpu.models import bouncer
        from ultrazoom_tpu.nn.transforms import spectral_init_state

        c_cfg = bouncer.BouncerConfig.from_dict(meta["critic_args"])
        c_params = bouncer.init(jax.random.key(1), c_cfg)
        sn = spectral_init_state(
            c_params, jax.random.key(2), bouncer.spectral_norm_paths
        )
        like = GanTrainState(
            params, opt.init(params), c_params, opt.init(c_params), sn,
            jnp.zeros((), jnp.int32),
        )
        state, meta = restore_state(path, like)
        return MewZoom(cfg, state.u_params), meta

    from ultrazoom_tpu.train.steps import load_pretrain_params

    model_params, meta = load_pretrain_params(path, cfg)
    return MewZoom(cfg, model_params), meta


def main(argv=None) -> None:
    from ultrazoom_tpu.export.stablehlo import (
        export_stablehlo,
        load_stablehlo,
        parity_check,
    )
    from ultrazoom_tpu.models import unet as _unet
    from ultrazoom_tpu.nn.transforms import materialize

    args = build_parser().parse_args(argv)
    model, meta = load_model_from_train_checkpoint(args.checkpoint_path)
    model.save_pretrained(args.output_path, dtype=args.dtype)
    print(
        f"Exported epoch-{meta.get('epoch', '?')} model "
        f"({model.num_params:,} params, {args.dtype}) to {args.output_path}"
    )
    if args.push_to_hub:
        model.push_to_hub(args.push_to_hub)
        print(f"Pushed to hub: {args.push_to_hub}")

    if args.stablehlo:
        from ultrazoom_tpu.models import MewZoomCtrl
        from ultrazoom_tpu.models import ctrl as _ctrl

        mat = materialize(model.params)
        x = jnp.zeros(
            (args.stablehlo_batch, args.stablehlo_size, args.stablehlo_size, 3),
            jnp.float32,
        )
        rng = np.random.default_rng(0)
        if isinstance(model, MewZoomCtrl):
            # (x, c) inputs — the reference's 0.2.x ONNX interface
            # (export_model.ipynb cell-9).
            def fn(x, c):
                return _ctrl.upscale(mat, x, c, cfg=model.cfg)

            c = jnp.zeros((args.stablehlo_batch, 3), jnp.float32)
            example = (x, c)
            check = (
                jnp.asarray(rng.uniform(0, 1, x.shape), jnp.float32),
                jnp.asarray(rng.uniform(0, 1, c.shape), jnp.float32),
            )
        else:
            def fn(x):
                return _unet.upscale(mat, x, model.cfg)

            example = (x,)
            check = (jnp.asarray(rng.uniform(0, 1, x.shape), jnp.float32),)
        export_stablehlo(args.stablehlo, fn, example)
        loaded = load_stablehlo(args.stablehlo)
        parity_check(fn, loaded, check)  # reference ONNX-gate tolerances
        print(f"StableHLO artifact written + parity-checked: {args.stablehlo}")


if __name__ == "__main__":
    main()
