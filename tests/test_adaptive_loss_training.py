"""Test the adaptive (Kendall) loss-combiner training path."""

import numpy as np
import jax
import jax.numpy as jnp

from ultrazoom_tpu.losses import init_vgg19_features
from ultrazoom_tpu.models import unet
from ultrazoom_tpu.train import TrainState, make_pretrain_step
from ultrazoom_tpu.train.steps import (
    make_adaptive_optimizer,
    wrap_params_with_loss_combiner,
)
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


def test_adaptive_pretrain_step_trains_log_sigmas():
    params = wrap_params_with_loss_combiner(unet.init(jax.random.key(0), TINY_CFG))
    vgg = init_vgg19_features(seed=0)
    opt = make_adaptive_optimizer(1e-3, 1.0, 1, adaptive_loss_learning_rate=1e-2)
    step = jax.jit(
        make_pretrain_step(TINY_CFG, opt, vgg, loss_combiner="adaptive")
    )
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(np.repeat(np.repeat(x, 2, 1), 2, 2)),
        "y_deg": jnp.asarray(rng.uniform(0, 1, (2, 3)), jnp.float32),
    }
    s0_sigmas = np.asarray(state.params["loss_combiner"]["log_sigmas"])
    for _ in range(3):
        state, m = step(state, batch)
    s1_sigmas = np.asarray(state.params["loss_combiner"]["log_sigmas"])
    assert not np.allclose(s0_sigmas, s1_sigmas)  # combiner weights learn
    assert np.isfinite(float(m["loss"]))


def test_load_pretrain_params_from_adaptive_checkpoint(tmp_path):
    """Fine-tune/export must restore model params from adaptive-loss
    checkpoints despite the different optimizer-state layout."""
    from ultrazoom_tpu.train.steps import load_pretrain_params
    from ultrazoom_tpu.utils import save_state

    params = wrap_params_with_loss_combiner(unet.init(jax.random.key(1), TINY_CFG))
    opt = make_adaptive_optimizer(1e-3, 1.0, 1)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    save_state(tmp_path / "ck", state, {"epoch": 1, "upscaler_args": TINY_CFG.to_dict()})

    got, meta = load_pretrain_params(tmp_path / "ck", TINY_CFG)
    assert meta["epoch"] == 1
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(params["model"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
