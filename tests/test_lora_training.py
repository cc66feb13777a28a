"""LoRA fine-tuning: only adapters move, base weights stay frozen."""

import numpy as np
import jax
import jax.numpy as jnp

from ultrazoom_tpu.losses import init_vgg19_features
from ultrazoom_tpu.models import unet
from ultrazoom_tpu.nn import add_lora
from ultrazoom_tpu.train import TrainState, make_pretrain_step
from ultrazoom_tpu.train.lora import make_lora_optimizer
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast default subset

TINY_CFG = unet.MewZoomConfig(
    upscale_ratio=2,
    primary_channels=8,
    primary_layers=2,
    secondary_channels=12,
    secondary_layers=2,
    tertiary_channels=16,
    tertiary_layers=2,
    quaternary_channels=24,
    quaternary_layers=2,
)


def test_lora_training_freezes_base():
    base = unet.init(jax.random.key(0), TINY_CFG)
    params = add_lora(base, rank=2, alpha=1.0, key=jax.random.key(1))
    opt = make_lora_optimizer(params, 1e-2)
    vgg = init_vgg19_features(seed=0)
    step = jax.jit(make_pretrain_step(TINY_CFG, opt, vgg))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(np.repeat(np.repeat(x, 2, 1), 2, 2)),
        "y_deg": jnp.asarray(rng.uniform(0, 1, (2, 3)), jnp.float32),
    }
    for _ in range(2):
        state, _ = step(state, batch)

    w0 = params["unet"]["encoder"]["stage1"][0]["convnet"]["conv1"]["weight"]
    w1 = state.params["unet"]["encoder"]["stage1"][0]["convnet"]["conv1"]["weight"]
    # Base kernel untouched; adapters moved.
    np.testing.assert_array_equal(np.asarray(w0["base"]), np.asarray(w1["base"]))
    assert not np.allclose(np.asarray(w0["lora_b"]), np.asarray(w1["lora_b"]))
    # Stem bias (non-LoRA leaf) frozen too.
    np.testing.assert_array_equal(
        np.asarray(params["stem"]["conv"]["bias"]),
        np.asarray(state.params["stem"]["conv"]["bias"]),
    )
