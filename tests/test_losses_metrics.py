"""Tests for losses and metrics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ultrazoom_tpu.losses import (
    adaptive_multitask,
    adaptive_multitask_init,
    balanced_multitask,
    bce_with_logits,
    init_vgg19_features,
    relativistic_bce,
    vgg_loss,
)
from ultrazoom_tpu.metrics import RelativisticF1, psnr, ssim, vif


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 1)).astype(np.float32)
    labels = (rng.uniform(size=(16, 1)) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-6


def test_relativistic_bce_matches_reference_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    pr = rng.normal(size=(8, 1)).astype(np.float32)
    pf = rng.normal(size=(8, 1)).astype(np.float32)
    yr = np.ones((8, 1), np.float32)
    yf = np.zeros((8, 1), np.float32)
    # Reference loss.py:71-77 formula in torch:
    tr, tf = torch.from_numpy(pr), torch.from_numpy(pf)
    logits = torch.cat([tr - tf.mean(), tf - tr.mean()])
    labels = torch.cat([torch.from_numpy(yr), torch.from_numpy(yf)])
    ref = torch.nn.functional.binary_cross_entropy_with_logits(logits, labels).item()
    got = float(relativistic_bce(jnp.asarray(pr), jnp.asarray(pf), jnp.asarray(yr), jnp.asarray(yf)))
    assert abs(got - ref) < 1e-6


def test_balanced_multitask_value_and_grads():
    losses = jnp.asarray([1.0, 10.0, 100.0])
    assert abs(float(balanced_multitask(losses)) - 3.0) < 1e-6
    # Gradient of each task normalised to 1/l_i.
    g = jax.grad(lambda l: balanced_multitask(l))(losses)
    np.testing.assert_allclose(np.asarray(g), [1.0, 0.1, 0.01], rtol=1e-6)


def test_balanced_multitask_floor_caps_amplification():
    """The divisor floor bounds the 1/l_i gradient weight at 1/floor; terms
    above the floor are untouched, and floor=None restores the reference's
    unbounded behaviour (a 1e-8 term would get a 1e8 gradient weight)."""
    losses = jnp.asarray([1e-8, 0.01, 1.0])
    g = jax.grad(lambda l: balanced_multitask(l, floor=1e-4))(losses)
    np.testing.assert_allclose(np.asarray(g), [1e4, 100.0, 1.0], rtol=1e-5)
    g_ref = jax.grad(lambda l: balanced_multitask(l, floor=None))(losses)
    np.testing.assert_allclose(np.asarray(g_ref), [1e8, 100.0, 1.0], rtol=1e-5)
    # Value stays ~num_tasks when every term is above the floor.
    healthy = jnp.asarray([0.01, 0.02, 0.5])
    assert abs(float(balanced_multitask(healthy, floor=1e-4)) - 3.0) < 1e-6


def test_balanced_multitask_post_normalisation_weights():
    """Weights scale each task AFTER gradient normalisation — a
    pre-multiplier would cancel inside l_i / sg(l_i).  All-ones weights are
    exactly the unweighted combiner (the reference recipe)."""
    losses = jnp.asarray([1.0, 10.0, 100.0])
    w = jnp.asarray([1.0, 1.0, 1.0])
    assert float(balanced_multitask(losses, weights=w)) == float(
        balanced_multitask(losses)
    )
    w = jnp.asarray([1.0, 0.5, 2.0])
    g = jax.grad(lambda l: balanced_multitask(l, weights=w))(losses)
    np.testing.assert_allclose(np.asarray(g), [1.0, 0.05, 0.02], rtol=1e-6)
    # Pre-multiplying the losses instead would NOT change gradients
    # (w/(w*l) = 1/l) — the failure mode the post-normalisation design
    # avoids.
    g_pre = jax.grad(lambda l: balanced_multitask(l * w))(losses)
    np.testing.assert_allclose(np.asarray(g_pre), [1.0, 0.1, 0.01], rtol=1e-6)


def test_adaptive_multitask():
    p = adaptive_multitask_init(3)
    losses = jnp.asarray([1.0, 2.0, 3.0])
    # log_sigmas = 0 -> 0.5 * sum(losses)
    assert abs(float(adaptive_multitask(p, losses)) - 3.0) < 1e-6


def test_adaptive_multitask_sigma_floor():
    """The runaway guard: log-sigmas below the floor act AS the floor and
    receive zero gradient, so the Kendall positive feedback (shrinking task
    loss -> sinking sigma -> unbounded task-gradient weight) stops at the
    floor instead of destabilising training (isolated by deterministic
    replay on the 4X Ctrl run — see losses/adversarial.py docstring)."""
    losses = jnp.asarray([0.01, 0.02, 0.03])
    deep = {"log_sigmas": jnp.asarray([-3.0, -1.25, 0.5])}
    at_floor = {"log_sigmas": jnp.asarray([-1.25, -1.25, 0.5])}
    v = adaptive_multitask(deep, losses, sigma_floor=-1.25)
    np.testing.assert_allclose(
        float(v), float(adaptive_multitask(at_floor, losses, -1.25)), rtol=1e-6
    )
    g = jax.grad(lambda q: adaptive_multitask(q, losses, -1.25))(deep)
    g = np.asarray(g["log_sigmas"])
    assert g[0] == 0.0            # floored entry: feedback severed
    assert g[1] != 0.0 and g[2] != 0.0  # at/above the floor: still learnable
    # sigma_floor=None restores the reference's unclamped weighting
    # (at s=-3 the exp(-2s) term dominates, so the unclamped value is larger).
    v_ref = adaptive_multitask(deep, losses, sigma_floor=None)
    assert float(v_ref) > float(v)


def test_vgg_loss_zero_for_identical_and_positive_otherwise():
    convs = init_vgg19_features(seed=0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    l22, l54 = vgg_loss(convs, x, x)
    assert float(l22) == 0.0 and float(l54) == 0.0
    y = jnp.clip(x + 0.1, 0, 1)
    l22b, l54b = vgg_loss(convs, y, x)
    assert float(l22b) > 0 and float(l54b) > 0


def test_vgg_feature_shapes():
    convs = init_vgg19_features(seed=0)
    from ultrazoom_tpu.losses import vgg_features

    f22, f54 = vgg_features(convs, jnp.zeros((1, 64, 64, 3)))
    assert f22.shape == (1, 32, 32, 128)  # after one pool, relu2_2
    assert f54.shape == (1, 4, 4, 512)  # after four pools, relu5_4


def test_psnr_basic():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4  # mse = 0.01 -> 20 dB
    assert float(psnr(a, a)) > 80


def test_ssim_properties():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6
    noisy = jnp.clip(x + 0.2 * jnp.asarray(rng.normal(size=x.shape)), 0, 1)
    s = float(ssim(noisy, x))
    assert 0.0 < s < 0.95


def test_ssim_matches_torch_golden():
    """Cross-check against a literal Wang et al. torch implementation."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (1, 3, 24, 24)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.normal(size=x.shape), 0, 1).astype(np.float32)

    # Independent torch computation.
    g = np.arange(11) - 5.0
    g1 = np.exp(-(g**2) / (2 * 1.5**2))
    g1 /= g1.sum()
    win = np.outer(g1, g1).astype(np.float32)
    w = torch.from_numpy(np.tile(win[None, None], (3, 1, 1, 1)))
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)

    def f(t):
        return F.conv2d(t, w, groups=3)

    mu_x, mu_y = f(xt), f(yt)
    sxx = f(xt * xt) - mu_x**2
    syy = f(yt * yt) - mu_y**2
    sxy = f(xt * yt) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
    )
    ref = smap.mean().item()

    got = float(ssim(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                     jnp.asarray(np.transpose(y, (0, 2, 3, 1)))))
    assert abs(got - ref) < 1e-5


def test_vif_properties():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (1, 48, 48, 3)), jnp.float32)
    perfect = float(vif(x, x))
    assert abs(perfect - 1.0) < 1e-3
    blurred = jnp.asarray(
        np.stack([_box_blur(np.asarray(x)[0, ..., c]) for c in range(3)], -1)
    )[None]
    degraded = float(vif(blurred, x))
    assert degraded < perfect


def _box_blur(img):
    out = img.copy()
    for _ in range(2):
        out = (
            np.roll(out, 1, 0) + out + np.roll(out, -1, 0)
            + np.roll(out, 1, 1) + np.roll(out, -1, 1)
        ) / 5.0
    return out


def test_relativistic_f1_converged_critic_is_half():
    """Random (uninformative) critic predictions -> F1 near 0.5."""
    rng = np.random.default_rng(6)
    m = RelativisticF1()
    for _ in range(50):
        m.update(
            rng.normal(size=(32, 1)), rng.normal(size=(32, 1)),
            np.ones((32, 1)), np.zeros((32, 1)),
        )
    f1, _, _ = m.compute()
    assert 0.35 < f1 < 0.65


def test_relativistic_f1_perfect_critic_is_one():
    m = RelativisticF1()
    m.update(
        np.full((16, 1), 5.0), np.full((16, 1), -5.0),
        np.ones((16, 1)), np.zeros((16, 1)),
    )
    f1, p, r = m.compute()
    assert f1 == 1.0 and p == 1.0 and r == 1.0
