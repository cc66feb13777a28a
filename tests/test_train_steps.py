"""Tests: pretrain/finetune steps, spectral norm, and mesh data-parallelism."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

from ultrazoom_tpu.losses import init_vgg19_features
from ultrazoom_tpu.models import bouncer, unet
from ultrazoom_tpu.nn.transforms import spectral_init_state, spectral_materialize
from ultrazoom_tpu.parallel import jit_data_parallel, make_mesh, shard_batch
from ultrazoom_tpu.train import (
    GanTrainState,
    TrainState,
    make_finetune_step,
    make_optimizer,
    make_pretrain_step,
)

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

TINY_CRITIC = bouncer.BouncerConfig(
    primary_channels=8, primary_layers=1,
    secondary_channels=12, secondary_layers=1,
    tertiary_channels=16, tertiary_layers=1,
    quaternary_channels=24, quaternary_layers=1,
)


def _batch(b=2, s=16, ratio=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)
    # Learnable target: nearest-upsampled x plus mild noise, so the pixel
    # loss has signal to descend (pure-noise targets are unlearnable).
    y = np.repeat(np.repeat(x, ratio, axis=1), ratio, axis=2)
    y = np.clip(y + 0.02 * rng.normal(size=y.shape), 0, 1).astype(np.float32)
    return {
        "x": jnp.asarray(x),
        "y": jnp.asarray(y),
        "y_deg": jnp.asarray(rng.uniform(0, 1, (b, 3)), jnp.float32),
    }


@pytest.mark.slow
def test_pretrain_step_decreases_loss():
    params = unet.init(jax.random.key(0), TINY_CFG)
    vgg = init_vgg19_features(seed=0)
    opt = make_optimizer(1e-3, 2.0)
    step = jax.jit(make_pretrain_step(TINY_CFG, opt, vgg))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    batch = _batch()
    losses = []
    for _ in range(16):
        state, m = step(state, batch)
        losses.append(float(m["pixel_l2"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
    assert int(state.step) == 16


@pytest.mark.slow
def test_pretrain_step_bf16_compute():
    """Training must work under the CLI's default bf16 compute policy
    (regression: f32-preferred conv accumulation broke the autodiff
    transpose with mixed dtypes)."""
    params = unet.init(jax.random.key(5), TINY_CFG)
    vgg = init_vgg19_features(seed=0)
    opt = make_optimizer(1e-3, 1.0)
    step = jax.jit(
        make_pretrain_step(TINY_CFG, opt, vgg, compute_dtype=jnp.bfloat16)
    )
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _batch(seed=5)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    state, m2 = step(state, batch)
    assert np.isfinite(float(m2["pixel_l2"]))


@pytest.mark.slow
def test_finetune_step_bf16_compute():
    u_params = unet.init(jax.random.key(6), TINY_CFG)
    c_params = bouncer.init(jax.random.key(7), TINY_CRITIC)
    sn = spectral_init_state(c_params, jax.random.key(8), bouncer.spectral_norm_paths)
    u_opt = make_optimizer(1e-4, 1.0)
    c_opt = make_optimizer(5e-4, 5.0)
    step = jax.jit(
        make_finetune_step(
            TINY_CFG, TINY_CRITIC, u_opt, c_opt, compute_dtype=jnp.bfloat16
        ),
        static_argnames="warmup",
    )
    state = GanTrainState(
        u_params, u_opt.init(u_params), c_params, c_opt.init(c_params), sn,
        jnp.zeros((), jnp.int32),
    )
    state, m = step(state, _batch(seed=6), warmup=False)
    assert np.isfinite(float(m["critic_bce"]))
    assert np.isfinite(float(m["pixel_l2"]))


@pytest.mark.slow
def test_pretrain_step_remat_matches():
    params = unet.init(jax.random.key(1), TINY_CFG)
    vgg = init_vgg19_features(seed=0)
    opt = make_optimizer(1e-3, None)
    s0 = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _batch(seed=1)
    plain = make_pretrain_step(TINY_CFG, opt, vgg, remat=False)(s0, batch)
    remat = make_pretrain_step(TINY_CFG, opt, vgg, remat=True)(s0, batch)
    a = jax.tree.leaves(plain[0].params)
    b = jax.tree.leaves(remat[0].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@pytest.mark.slow
def test_gradient_accumulation_matches_large_batch():
    params = unet.init(jax.random.key(2), TINY_CFG)
    vgg = init_vgg19_features(seed=0)
    big = _batch(b=4, seed=2)
    half1 = jax.tree.map(lambda x: x[:2], big)
    half2 = jax.tree.map(lambda x: x[2:], big)

    opt_full = make_optimizer(1e-3, None, accumulation_steps=1)
    opt_acc = make_optimizer(1e-3, None, accumulation_steps=2)

    sf = TrainState(params, opt_full.init(params), jnp.zeros((), jnp.int32))
    sf, _ = jax.jit(make_pretrain_step(TINY_CFG, opt_full, vgg))(sf, big)

    sa = TrainState(params, opt_acc.init(params), jnp.zeros((), jnp.int32))
    step_acc = jax.jit(make_pretrain_step(TINY_CFG, opt_acc, vgg))
    sa, _ = step_acc(sa, half1)
    sa, _ = step_acc(sa, half2)

    # balanced multitask renormalises per micro-batch, so exact equality
    # isn't expected — but updates must be close in direction & magnitude.
    for x, y in zip(jax.tree.leaves(sf.params), jax.tree.leaves(sa.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-3)


@pytest.mark.slow
def test_finetune_step_runs_both_phases():
    u_params = unet.init(jax.random.key(3), TINY_CFG)
    c_params = bouncer.init(jax.random.key(4), TINY_CRITIC)
    sn = spectral_init_state(c_params, jax.random.key(5), bouncer.spectral_norm_paths)
    u_opt = make_optimizer(1e-4, 1.0)
    c_opt = make_optimizer(5e-4, 5.0)
    step = make_finetune_step(TINY_CFG, TINY_CRITIC, u_opt, c_opt)
    jstep = jax.jit(step, static_argnames="warmup")

    state = GanTrainState(
        u_params, u_opt.init(u_params), c_params, c_opt.init(c_params), sn,
        jnp.zeros((), jnp.int32),
    )
    batch = _batch(seed=3)

    # Warmup: only the critic moves.
    s1, m1 = jstep(state, batch, warmup=True)
    assert "critic_bce" in m1 and "pixel_l2" not in m1
    assert np.allclose(
        np.asarray(jax.tree.leaves(s1.u_params)[0]),
        np.asarray(jax.tree.leaves(state.u_params)[0]),
    )
    c_moved = not np.allclose(
        np.asarray(jax.tree.leaves(s1.c_params)[0]),
        np.asarray(jax.tree.leaves(state.c_params)[0]),
    )
    assert c_moved

    # Full phase: both move.
    s2, m2 = jstep(s1, batch, warmup=False)
    assert "pixel_l2" in m2 and "upscaler_bce" in m2
    u_moved = not np.allclose(
        np.asarray(jax.tree.leaves(s2.u_params)[0]),
        np.asarray(jax.tree.leaves(s1.u_params)[0]),
    )
    assert u_moved


def test_gan_term_weights_change_gradients_not_losses():
    """pixel/feature-match/adversarial weights are POST-normalisation
    multipliers: reported per-term losses are identical at any weight
    (they would cancel inside l_i / stop_grad(l_i) as pre-multipliers),
    while the generator update direction changes."""
    u_params = unet.init(jax.random.key(3), TINY_CFG)
    c_params = bouncer.init(jax.random.key(4), TINY_CRITIC)
    sn = spectral_init_state(c_params, jax.random.key(5), bouncer.spectral_norm_paths)
    u_opt = make_optimizer(1e-4, 1.0)
    c_opt = make_optimizer(5e-4, 5.0)
    state = GanTrainState(
        u_params, u_opt.init(u_params), c_params, c_opt.init(c_params), sn,
        jnp.zeros((), jnp.int32),
    )
    batch = _batch(seed=3)

    step1 = jax.jit(
        make_finetune_step(TINY_CFG, TINY_CRITIC, u_opt, c_opt),
        static_argnames="warmup",
    )
    step3 = jax.jit(
        make_finetune_step(
            TINY_CFG, TINY_CRITIC, u_opt, c_opt, pixel_weight=3.0
        ),
        static_argnames="warmup",
    )
    s1, m1 = step1(state, batch, warmup=False)
    s3, m3 = step3(state, batch, warmup=False)
    for k in m1:
        if k.endswith("_grad_norm"):
            continue  # gradient magnitudes legitimately depend on the weights
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m3[k]), rtol=1e-6,
            err_msg=f"term {k} must not depend on post-norm weights",
        )
    diff = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s1.u_params), jax.tree.leaves(s3.u_params))
    )
    assert diff, "pixel_weight must steer the generator update"


def test_spectral_norm_scales_to_unit_sigma():
    c_params = bouncer.init(jax.random.key(6), TINY_CRITIC)
    sn = spectral_init_state(c_params, jax.random.key(7), bouncer.spectral_norm_paths)
    p, sn = spectral_materialize(c_params, sn)
    for _ in range(30):
        p, sn = spectral_materialize(c_params, sn)
    # After many power iterations a normed weight should have sigma ~ 1.
    w = p["detector"]["downsample1"]["conv"]["weight"]
    mat = np.asarray(w).transpose(3, 0, 1, 2).reshape(w.shape[-1], -1)
    sigma = np.linalg.svd(mat, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 1e-2
    # ARM gate convs are excluded (reference parity).
    skip_w = p["detector"]["stage1"][0]["skip"]["conv"]["weight"]
    orig = c_params["detector"]["stage1"][0]["skip"]["conv"]["weight"]
    np.testing.assert_allclose(np.asarray(skip_w), np.asarray(orig))


def test_bouncer_shapes():
    c_params = bouncer.init(jax.random.key(8), TINY_CRITIC)
    x = jnp.zeros((2, 64, 64, 3))
    z1, z2, z3, z4, logit = bouncer.apply(c_params, x)
    assert z1.shape == (2, 32, 32, 8)
    assert z4.shape == (2, 4, 4, 24)
    assert logit.shape == (2, 1)


def test_bouncer_preset_sizes():
    for name in ("small", "medium", "large"):
        cfg = bouncer.PRESETS[name]
        assert cfg.quaternary_channels > cfg.primary_channels


@pytest.mark.slow
def test_data_parallel_step_matches_single_device():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should force 8 virtual CPU devices"
    mesh = make_mesh(devs)

    params = unet.init(jax.random.key(9), TINY_CFG)
    vgg = init_vgg19_features(seed=0)
    opt = make_optimizer(1e-3, 1.0)
    step = make_pretrain_step(TINY_CFG, opt, vgg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _batch(b=8, seed=9)

    # Single-device reference.
    ref_state, ref_m = jax.jit(step)(state, batch)

    # Mesh-sharded (batch split over 8 devices, params replicated).
    pstep = jit_data_parallel(step, mesh, donate_state=False)
    sharded = shard_batch(mesh, batch)
    got_state, got_m = pstep(state, sharded)

    np.testing.assert_allclose(
        float(got_m["pixel_l2"]), float(ref_m["pixel_l2"]), rtol=1e-5
    )
    # Sharded reductions change float summation order; near-zero gradient
    # elements can flip their Adam update sign, so bound by ~2*lr rather
    # than float tolerance.
    for x, y in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(got_state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-3)


@pytest.mark.slow
def test_ctrl_pretrain_mesh_matches_single_device():
    """Ctrl pretrain under the 8-device mesh == single device: the scan
    body + FiLM einsum + `hidden` remat + adaptive combiner composed under
    sharding (VERDICT r3 Weak #5 — this combination breaks only composed)."""
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.train.steps import (
        make_adaptive_optimizer,
        make_ctrl_pretrain_step,
        wrap_params_with_loss_combiner,
    )

    devs = jax.devices()
    assert len(devs) >= 8, "conftest should force 8 virtual CPU devices"
    mesh = make_mesh(devs)

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=3)
    params = wrap_params_with_loss_combiner(ctrl.init(jax.random.key(11), cfg), 3)
    vgg = init_vgg19_features(seed=0)
    opt = make_adaptive_optimizer(1e-3, 1.0, accumulation_steps=1)
    step = make_ctrl_pretrain_step(
        cfg, opt, vgg, loss_combiner="adaptive", remat="hidden"
    )
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _batch(b=8, seed=11)

    ref_state, ref_m = jax.jit(step)(state, batch)

    pstep = jit_data_parallel(step, mesh, donate_state=False)
    got_state, got_m = pstep(state, shard_batch(mesh, batch))

    np.testing.assert_allclose(
        float(got_m["loss"]), float(ref_m["loss"]), rtol=1e-5
    )
    # Same tolerance rationale as the U-Net mesh test above: sharded
    # reductions reorder float sums; near-zero grads can flip Adam signs.
    for x, y in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(got_state.params)
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-3)


def test_pixel_ssim_combiner_trains():
    """pixel_ssim: balanced pixel + differentiable (1-SSIM); finite grads,
    dssim reported, a few steps reduce it on a fixed batch."""
    import numpy as np

    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.train import TrainState, make_optimizer
    from ultrazoom_tpu.train.steps import make_ctrl_pretrain_step

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    params = ctrl.init(jax.random.key(0), cfg)
    opt = make_optimizer(3e-3, 1.0)
    step = jax.jit(make_ctrl_pretrain_step(cfg, opt, None, loss_combiner="pixel_ssim"))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32),
        "y": rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32),
        "y_deg": rng.uniform(0, 1, (2, 3)).astype(np.float32),
    }
    first = None
    for _ in range(8):
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["dssim"]))
        first = first if first is not None else float(m["dssim"])
    assert float(m["dssim"]) < first
