"""Export-CLI pipeline test: train -> export -> reload both ways."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast default subset


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    """One pretrain step on a tiny model, checkpointed."""
    from ultrazoom_tpu.losses import init_vgg19_features
    from ultrazoom_tpu.models import unet
    from ultrazoom_tpu.train import TrainState, make_optimizer, make_pretrain_step
    from ultrazoom_tpu.utils import save_state

    cfg = unet.MewZoomConfig(
        upscale_ratio=2,
        primary_channels=8, primary_layers=2,
        secondary_channels=12, secondary_layers=2,
        tertiary_channels=16, tertiary_layers=2,
        quaternary_channels=24, quaternary_layers=2,
    )
    params = unet.init(jax.random.key(0), cfg)
    opt = make_optimizer(1e-3, 1.0)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_pretrain_step(cfg, opt, init_vgg19_features(seed=0)))
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(np.repeat(np.repeat(x, 2, 1), 2, 2)),
        "y_deg": jnp.asarray(rng.uniform(0, 1, (2, 3)), jnp.float32),
    }
    state, _ = step(state, batch)
    ck = tmp_path_factory.mktemp("ck") / "ckpt"
    save_state(ck, state, {"epoch": 1, "upscaler_args": cfg.to_dict()})
    return ck, cfg, state


def test_export_cli_produces_loadable_artifacts(trained_checkpoint, tmp_path):
    from ultrazoom_tpu.models import from_pretrained
    from ultrazoom_tpu.tools.export import main

    ck, cfg, state = trained_checkpoint
    out = tmp_path / "hf"
    hlo = tmp_path / "model.stablehlo"
    main([
        "--checkpoint_path", str(ck),
        "--output_path", str(out),
        "--stablehlo", str(hlo),
        "--stablehlo_size", "16",
    ])
    assert (out / "model.safetensors").exists()
    assert hlo.exists()

    model = from_pretrained(out)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    y = model.upscale(x)
    assert y.shape == (1, 32, 32, 3)

    # Exported params equal trained params end to end.
    from ultrazoom_tpu.models import unet

    want, _ = unet.apply(state.params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(
        np.asarray(model.upscale(x)),
        np.clip(np.asarray(want), 0, 1),
        atol=1e-5,
    )


def test_export_cli_bf16_dtype(trained_checkpoint, tmp_path):
    """--dtype bfloat16 halves the artifact; load upcasts to f32 and the
    upscale stays within bf16 rounding of the f32 export."""
    from ultrazoom_tpu.models import from_pretrained
    from ultrazoom_tpu.tools.export import main

    ck, cfg, state = trained_checkpoint
    f32_dir, bf16_dir = tmp_path / "f32", tmp_path / "bf16"
    main(["--checkpoint_path", str(ck), "--output_path", str(f32_dir)])
    main(["--checkpoint_path", str(ck), "--output_path", str(bf16_dir),
          "--dtype", "bfloat16"])
    f32_sz = (f32_dir / "model.safetensors").stat().st_size
    bf16_sz = (bf16_dir / "model.safetensors").stat().st_size
    assert bf16_sz < 0.6 * f32_sz

    model = from_pretrained(bf16_dir)
    leaf = jax.tree.leaves(model.params)[0]
    assert leaf.dtype == np.float32  # transparent upcast on load
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    ref = from_pretrained(f32_dir).upscale(x)
    np.testing.assert_allclose(
        np.asarray(model.upscale(x)), np.asarray(ref), atol=1e-2
    )


def test_validate_accepts_train_checkpoint(trained_checkpoint, tmp_path):
    from PIL import Image

    from ultrazoom_tpu.tools.validate import main as val_main

    ck, _, _ = trained_checkpoint
    rng = np.random.default_rng(2)
    (tmp_path / "lr").mkdir()
    (tmp_path / "hr").mkdir()
    for i in range(2):
        hr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(hr[::2, ::2]).save(tmp_path / "lr" / f"{i}.png")
        Image.fromarray(hr).save(tmp_path / "hr" / f"{i}.png")
    val_main([
        "--model_path", str(ck),
        "--lr_images_path", str(tmp_path / "lr"),
        "--hr_images_path", str(tmp_path / "hr"),
        "--compute_dtype", "float32",
    ])
