"""GAN and multitask losses (pure functions).

Reference: loss.py:54-145.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "bce_with_logits",
    "relativistic_bce",
    "balanced_multitask",
    "adaptive_multitask",
    "adaptive_multitask_init",
]


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable mean BCE-with-logits (torch semantics)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def relativistic_bce(
    y_pred_real: jax.Array,
    y_pred_fake: jax.Array,
    y_real: jax.Array,
    y_fake: jax.Array,
) -> jax.Array:
    """RaGAN: BCE on (real - mean(fake)) and (fake - mean(real)) against the
    given labels (reference loss.py:64-79; both shifts use the *original*
    means)."""
    real_hat = y_pred_real - jnp.mean(y_pred_fake)
    fake_hat = y_pred_fake - jnp.mean(y_pred_real)
    logits = jnp.concatenate([real_hat, fake_hat], axis=0)
    labels = jnp.concatenate([y_real, y_fake], axis=0)
    return bce_with_logits(logits, labels)


def balanced_multitask(
    losses: jax.Array, floor: float | None = 1e-4,
    weights: jax.Array | None = None,
) -> jax.Array:
    """sum(l_i / stop_grad(l_i)) — every task's gradient normalised to equal
    magnitude; the value is always the number of tasks (loss.py:82-93).

    ``floor`` (documented divergence from the reference): each task's
    divisor is clamped to at least ``floor``, capping the stock formula's
    1/l_i task-gradient weight — which is UNBOUNDED as a task fits well —
    at 1/floor.  Terms above the floor (all of them, in healthy training —
    MSEs on [0,1] images sit around 1e-2) are untouched.  This is
    defence-in-depth against the same positive-feedback family as the
    adaptive combiner's measured sigma runaway, NOT the root cause of the
    observed 56M spike: the forensic A/C replay of that spike
    (tools/forensic_balanced.py; epoch 4, step 331, reproduced
    bit-deterministically) was BIT-IDENTICAL with and without the floor —
    no divisor ever dipped below 1e-4 there; phase D pinned that incident
    on edge-of-stability lr instead.  Pass ``floor=None`` for the
    reference's exact unclamped behaviour.

    ``weights`` (optional) scales each task AFTER its gradient
    normalisation (a pre-multiplier would cancel in ``l_i / sg(l_i)``);
    None means all-ones, the reference's equal-weight behaviour."""
    div = jax.lax.stop_gradient(losses)
    if floor is not None:
        div = jnp.maximum(div, floor)
    normalized = losses / div
    if weights is not None:
        normalized = normalized * weights
    return jnp.sum(normalized)


def adaptive_multitask_init(num_losses: int) -> dict:
    return {"log_sigmas": jnp.zeros((num_losses,), jnp.float32)}


def adaptive_multitask(
    params: dict, losses: jax.Array, sigma_floor: float = -1.25
) -> jax.Array:
    """Kendall homoscedastic-uncertainty weighting with learnable log-sigmas
    (loss.py:96-145): sum(0.5 * exp(-2s) * l + s).

    ``sigma_floor`` (documented divergence from the reference, whose
    AdaptiveMultitaskLoss is unused by any of its scripts): log-sigmas are
    clamped from below inside the loss.  Kendall weighting has a positive
    feedback — as a task loss shrinks, its equilibrium s* = 0.5*ln(l)
    sinks and the task-gradient weight exp(-2s) grows without bound, until
    an ordinary batch destabilises the bf16 forward of a deep body.  This
    was isolated with a deterministic replay A/B (4X Ctrl, epoch 6: stock
    sigmas at -1.71 => grad spikes to 3e9; sigmas pinned at -1.38 => max
    grad_norm 1.59 on the identical state+data) — see
    ARCHITECTURE.md "Adaptive-loss runaway".  The clamp zeroes ds below
    the floor, so weighting freezes instead of running away.  Pass
    ``sigma_floor=None`` for the reference's unclamped behaviour.
    """
    s = params["log_sigmas"]
    if sigma_floor is not None:
        s = jnp.maximum(s, sigma_floor)
    return jnp.sum(0.5 * jnp.exp(-2.0 * s) * losses + s)
