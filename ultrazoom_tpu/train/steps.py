"""Jitted training steps: stage-1 pretraining and stage-2 GAN fine-tuning.

Reference loops: pretrain.py:233-344 and fine-tune.py:240-330.  Key
TPU-native differences (deliberate, documented):

* The whole step — forward, losses, backward, clip, optimizer — is ONE
  jitted function; scalars stay on device (the reference's per-batch
  ``.item()`` D2H syncs are a known perf bug we do not replicate).
* Gradient accumulation is ``optax.MultiSteps`` around the optimizer
  (mathematically the reference's scaled-loss accumulation + clip-then-step
  on the averaged gradients).
* bf16 is a compute-dtype policy with f32 params/accumulation — TPU-native
  mixed precision, no loss scaling needed.
* Fine-tune: the generator's adversarial pass re-uses the upscaler forward
  via ``jax.vjp`` (the reference shares ``u_pred_sr`` across both phases the
  same way).  Generator gradients touch ONLY upscaler params — the torch
  script leaks generator-phase gradients into the critic's next accumulation
  window (fine-tune.py:310 backward with no critic zero_grad); that is a
  reference bug we intentionally do not replicate.
* Spectral norm on the critic is an explicit (params, u-state) power
  iteration updated once per critic step, stop_gradient'd like torch's
  buffers.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ultrazoom_tpu.losses import (
    adaptive_multitask,
    adaptive_multitask_init,
    balanced_multitask,
    relativistic_bce,
    vgg_loss,
)
from ultrazoom_tpu.models import bouncer as _bouncer
from ultrazoom_tpu.models import unet as _unet
from ultrazoom_tpu.nn.transforms import materialize, spectral_materialize

__all__ = [
    "TrainState",
    "GanTrainState",
    "make_optimizer",
    "make_pretrain_step",
    "make_ctrl_pretrain_step",
    "make_finetune_step",
    "make_ctrl_finetune_step",
    "make_eval_step",
    "make_ctrl_eval_step",
    "as_float01",
    "normalize_batch",
]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class GanTrainState(NamedTuple):
    u_params: Any
    u_opt_state: Any
    c_params: Any
    c_opt_state: Any
    sn_state: Any
    step: jax.Array


def make_optimizer(
    learning_rate,
    max_gradient_norm: float | None = 2.0,
    accumulation_steps: int = 1,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip (+ MultiSteps accumulation), matching the
    reference's AdamW/clip_grad_norm_/accumulation recipe.

    ``learning_rate`` may be a float or an optax schedule (schedules count
    inner updates — one per accumulation window under MultiSteps)."""
    chain = []
    if max_gradient_norm is not None:
        chain.append(optax.clip_by_global_norm(max_gradient_norm))
    chain.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx


def make_adaptive_optimizer(
    learning_rate,
    max_gradient_norm: float | None,
    accumulation_steps: int,
    adaptive_loss_learning_rate: float = 1e-3,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    """Optimizer for adaptive-loss training: model params get the usual
    clip+AdamW, the Kendall log-sigmas their own AdamW at
    ``adaptive_loss_learning_rate`` (reference README.md:305 flag)."""
    chain = []
    if max_gradient_norm is not None:
        chain.append(optax.clip_by_global_norm(max_gradient_norm))
    chain.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    model_tx = optax.chain(*chain)
    loss_tx = optax.adamw(adaptive_loss_learning_rate)

    def labels(params):
        return {
            "model": jax.tree.map(lambda _: "model", params["model"]),
            "loss_combiner": jax.tree.map(
                lambda _: "loss", params["loss_combiner"]
            ),
        }

    tx = optax.multi_transform({"model": model_tx, "loss": loss_tx}, labels)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx


def _mse(a, b):
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def as_float01(a: jax.Array) -> jax.Array:
    """Device-side uint8 -> f32/255 (identity on float inputs).

    Batches travel host->device as uint8 (the sample caches are uint8-exact)
    and are normalised on device: 4x less interconnect traffic than shipping
    f32 — the difference between loader-bound and compute-bound on narrow
    H2D links.  f32(u8)/255 here is bit-identical to dividing on the host.
    """
    if a.dtype == jnp.uint8:
        return a.astype(jnp.float32) / 255.0
    return a


def normalize_batch(batch: dict) -> dict:
    """Apply :func:`as_float01` to the image keys of a train batch."""
    out = dict(batch)
    for k in ("x", "y"):
        if k in out:
            out[k] = as_float01(out[k])
    return out


def load_pretrain_params(path, cfg: "_unet.MewZoomConfig"):
    """Restore just the model params from a pretrain checkpoint directory,
    handling both the plain and the adaptive-loss (wrapped) layouts — the
    optimizer-state layout is irrelevant (positional prefix restore)."""
    from ultrazoom_tpu.utils import latest_meta, restore_params_only

    meta = latest_meta(path)
    params = _unet.init(jax.random.key(0), cfg)
    try:
        return restore_params_only(path, params), meta
    except AssertionError:
        wrapped = wrap_params_with_loss_combiner(params)
        return restore_params_only(path, wrapped)["model"], meta


def load_ctrl_pretrain_params(path, cfg):
    """Ctrl-architecture counterpart of :func:`load_pretrain_params`."""
    from ultrazoom_tpu.models import ctrl as _ctrl
    from ultrazoom_tpu.utils import latest_meta, restore_params_only

    meta = latest_meta(path)
    params = _ctrl.init(jax.random.key(0), cfg)
    try:
        return restore_params_only(path, params), meta
    except AssertionError:
        wrapped = wrap_params_with_loss_combiner(params, 3)
        return restore_params_only(path, wrapped)["model"], meta


def wrap_params_with_loss_combiner(params, num_tasks: int = 4) -> Any:
    """Augment a model param tree with learnable Kendall log-sigmas for the
    pretrain tasks (reference AdaptiveMultitaskLoss, loss.py:96-145): 4 for
    the U-Net (pixel, vgg22, vgg54, degradation), 3 for Ctrl (no QA head)."""
    return {"model": params, "loss_combiner": adaptive_multitask_init(num_tasks)}


def make_pretrain_step(
    model_cfg: _unet.MewZoomConfig,
    optimizer: optax.GradientTransformation,
    vgg_convs,
    remat: bool = False,
    compute_dtype=None,
    loss_combiner: str = "balanced",
    adaptive_sigma_floor: float | None = -1.25,
    balanced_floor: float | None = 1e-4,
) -> Callable:
    """Stage-1 step: pixel MSE + vgg22 + vgg54 + deg MSE combined by
    BalancedMultitask (reference pretrain.py:245-267) or AdaptiveMultitask
    (learnable uncertainty weights; wrap params with
    :func:`wrap_params_with_loss_combiner` first).

    ``loss_combiner="pixel"`` drops the VGG towers (pixel + deg, balanced)
    — the distortion-oriented recipe for environments without pretrained
    VGG19 weights (see make_ctrl_pretrain_step docstring);
    ``"pixel_ssim"`` additionally balances a differentiable (1 - SSIM)
    term (metrics/quality.ssim) to target structural fidelity directly."""
    assert loss_combiner in ("balanced", "adaptive", "pixel", "pixel_ssim")
    adaptive = loss_combiner == "adaptive"
    pixel_only = loss_combiner in ("pixel", "pixel_ssim")
    with_ssim = loss_combiner == "pixel_ssim"

    def loss_fn(params, batch):
        model_params = params["model"] if adaptive else params
        mat = materialize(model_params)
        sr, qa = _unet.apply(
            mat, batch["x"], model_cfg, remat=remat, compute_dtype=compute_dtype
        )
        pixel = _mse(sr, batch["y"])
        deg = _mse(qa, batch["y_deg"])
        if pixel_only:
            terms = [pixel, deg]
            aux = {"pixel_l2": pixel, "degradation_l2": deg}
            if with_ssim:
                from ultrazoom_tpu.metrics.quality import ssim as _ssim

                dssim = 1.0 - _ssim(jnp.clip(sr, 0.0, 1.0), batch["y"])
                terms.append(dssim)
                aux["dssim"] = dssim
            total = balanced_multitask(jnp.stack(terms), balanced_floor)
            return total, {"loss": total, **aux}
        # VGG towers at the compute dtype — the reference autocasts the
        # compiled VGG loss to bf16 (pretrain.py:117-123,200); f32 towers
        # also blow HBM at batch 32 x 256^2 (the final MSEs stay f32).
        ld = compute_dtype or sr.dtype
        l22, l54 = vgg_loss(
            vgg_convs, sr.astype(ld), batch["y"].astype(ld)
        )
        losses = jnp.stack([pixel, l22, l54, deg])
        if adaptive:
            total = adaptive_multitask(
                params["loss_combiner"], losses, adaptive_sigma_floor
            )
        else:
            total = balanced_multitask(losses, balanced_floor)
        aux = {
            "loss": total,
            "pixel_l2": pixel,
            "vgg22_l2": l22,
            "vgg54_l2": l54,
            "degradation_l2": deg,
        }
        return total, aux

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, normalize_batch(batch)
        )
        aux["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), aux

    return step


def make_ctrl_pretrain_step(
    model_cfg,
    optimizer: optax.GradientTransformation,
    vgg_convs,
    compute_dtype=None,
    loss_combiner: str = "balanced",
    remat: bool = False,
    adaptive_sigma_floor: float | None = -1.25,
    balanced_floor: float | None = 1e-4,
) -> Callable:
    """Stage-1 step for the controllable 0.1.x/0.2.x architecture
    (models/ctrl.py — the family of every published HF checkpoint).

    The FiLM control input is conditioned on the TRUE sampled degradation
    strengths (``c = y_deg``), so the body learns to modulate enhancement
    per degradation — the recipe the 0.2.x inference API implies (the user
    asserts the degradation mix via ``ControlVector`` at inference,
    reference README.md:88-129 / validate.py:73-82).  Loss: pixel MSE +
    vgg22 + vgg54, balanced (this architecture has no QA head; the
    reference's 0.2.x ``--num_channels/--num_encoder_layers`` flags,
    README.md:254-257, are restored by the pretrain CLI's ``--arch ctrl``).

    ``loss_combiner="pixel"`` trains on pixel MSE alone (no VGG towers in
    the graph).  This mode exists because the reference's perceptual terms
    assume *pretrained* VGG19 features (loss.py:19-24); in environments
    where those weights are unavailable the documented fallback is seeded
    random features, and distances in a random feature space should not
    outvote the pixel term 2:1 — pixel mode is the honest distortion-
    (PSNR-) oriented recipe there, and is also ~2x faster per step.
    """
    from ultrazoom_tpu.models import ctrl as _ctrl

    assert loss_combiner in ("balanced", "adaptive", "pixel", "pixel_ssim")
    adaptive = loss_combiner == "adaptive"
    pixel_only = loss_combiner in ("pixel", "pixel_ssim")
    with_ssim = loss_combiner == "pixel_ssim"

    def loss_fn(params, batch):
        model_params = params["model"] if adaptive else params
        mat = materialize(model_params)
        sr = _ctrl.apply(
            mat, batch["x"], batch["y_deg"], cfg=model_cfg,
            compute_dtype=compute_dtype, remat=remat,
        )
        pixel = _mse(sr, batch["y"])
        if pixel_only:
            if with_ssim:
                from ultrazoom_tpu.metrics.quality import ssim as _ssim

                dssim = 1.0 - _ssim(jnp.clip(sr, 0.0, 1.0), batch["y"])
                total = balanced_multitask(jnp.stack([pixel, dssim]), balanced_floor)
                return total, {"loss": total, "pixel_l2": pixel, "dssim": dssim}
            return pixel, {"loss": pixel, "pixel_l2": pixel}
        # bf16 VGG towers under mixed precision (see make_pretrain_step).
        ld = compute_dtype or sr.dtype
        l22, l54 = vgg_loss(
            vgg_convs, sr.astype(ld), batch["y"].astype(ld)
        )
        losses = jnp.stack([pixel, l22, l54])
        if adaptive:
            total = adaptive_multitask(
                params["loss_combiner"], losses, adaptive_sigma_floor
            )
        else:
            total = balanced_multitask(losses, balanced_floor)
        return total, {
            "loss": total, "pixel_l2": pixel, "vgg22_l2": l22, "vgg54_l2": l54,
        }

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, normalize_batch(batch)
        )
        aux["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), aux

    return step


def make_ctrl_eval_step(model_cfg, compute_dtype=None) -> Callable:
    """Ctrl eval: clamp'd SR conditioned on the true degradation labels
    (what the reference's validate.py does with its assumed-control
    tensor)."""
    from ultrazoom_tpu.models import ctrl as _ctrl

    def step(params, x, y_deg):
        mat = materialize(params)
        return _ctrl.upscale(
            mat, as_float01(x), y_deg, cfg=model_cfg, compute_dtype=compute_dtype
        )

    return step


def make_eval_step(model_cfg, compute_dtype=None) -> Callable:
    """Eval: model + bicubic PSNR/SSIM inputs (metrics applied outside)."""

    def step(params, x):
        mat = materialize(params)
        sr, qa = _unet.apply(
            mat, as_float01(x), model_cfg, compute_dtype=compute_dtype
        )
        return jnp.clip(sr, 0.0, 1.0), qa

    return step


def _make_gan_step(
    generator_forward: Callable,
    sr_of: Callable,
    extra_gen_terms: Callable,
    u_optimizer: optax.GradientTransformation,
    c_optimizer: optax.GradientTransformation,
    remat: bool = False,
    compute_dtype=None,
    feature_match_weight: float = 1.0,
    adversarial_weight: float = 1.0,
    pixel_weight: float = 1.0,
) -> Callable:
    """Shared two-phase RaGAN step scaffolding (fine-tune.py:240-330).

    Both model families run the identical recipe — phase A critic update on
    detached SR, phase B generator update through the just-updated critic
    with pixel + critic-stage2/3 feature-matching + adversarial BCE — so
    there is exactly ONE copy of it, parameterized by:

    * ``generator_forward(u_params, batch) -> outputs`` — the generator
      apply; ``outputs`` may be any pytree (e.g. ``(sr, qa)`` or ``sr``).
    * ``sr_of(outputs) -> sr`` — projects the SR image out of ``outputs``.
    * ``extra_gen_terms(outputs, batch) -> [(name, loss), ...]`` — extra
      generator loss terms (the U-Net's QA/degradation term; empty for
      Ctrl), inserted before the adversarial BCE.

    ``warmup`` is a static argument: during critic warm-up epochs only
    phase A runs (fine-tune.py:247, 288).

    ``feature_match_weight`` / ``adversarial_weight`` / ``pixel_weight``
    scale the critic feature-matching terms (stage2/stage3 L2), the
    adversarial BCE, and the pixel L2 anchor *after* the balanced
    combiner's per-term gradient normalisation — a pre-multiplier would
    cancel inside ``l_i / stop_grad(l_i)``.  At the defaults (1.0) the
    step is exactly the reference recipe (fine-tune.py:288-311); they
    exist for the round-4 GAN recipe sweep (the sweep showed the stage
    trades distortion for VIF continuously, so the distortion-anchoring
    pixel weight is the lever that moves the trade's slope).
    """

    critic_remat = bool(remat)  # selective policies are generator-side only

    def critic_forward(c_params, sn_state, x, update):
        c_mat, new_sn = spectral_materialize(c_params, sn_state, update=update)
        outs = _bouncer.apply(
            c_mat, x, remat=critic_remat, compute_dtype=compute_dtype
        )
        return outs, new_sn

    def critic_loss(c_params, sn_state, sr_detached, y_real_img, y_real, y_fake):
        fake_outs, new_sn = critic_forward(c_params, sn_state, sr_detached, True)
        real_outs, _ = critic_forward(c_params, new_sn, y_real_img, False)
        loss = relativistic_bce(real_outs[-1], fake_outs[-1], y_real, y_fake)
        return loss, new_sn

    def gen_outputs_loss(outputs, c_params, sn_state, batch, y_real, y_fake):
        sr = sr_of(outputs)
        fake_outs, _ = critic_forward(c_params, sn_state, sr, False)
        real_outs, _ = critic_forward(c_params, sn_state, batch["y"], False)
        terms = [
            ("pixel_l2", _mse(sr, batch["y"]), pixel_weight),
            (
                "stage2_l2",
                _mse(fake_outs[1], jax.lax.stop_gradient(real_outs[1])),
                feature_match_weight,
            ),
            (
                "stage3_l2",
                _mse(fake_outs[2], jax.lax.stop_gradient(real_outs[2])),
                feature_match_weight,
            ),
        ]
        terms += [(n, v, 1.0) for n, v in extra_gen_terms(outputs, batch)]
        # Swapped labels: generator wants fakes classified real
        # (fine-tune.py:300).
        terms.append(
            (
                "upscaler_bce",
                relativistic_bce(real_outs[-1], fake_outs[-1], y_fake, y_real),
                adversarial_weight,
            )
        )
        total = balanced_multitask(
            jnp.stack([v for _, v, _ in terms]),
            weights=jnp.asarray([w for _, _, w in terms], jnp.float32),
        )
        return total, {n: v for n, v, _ in terms}

    def step(state: GanTrainState, batch, warmup: bool):
        batch = normalize_batch(batch)
        b = batch["x"].shape[0]
        y_real = jnp.ones((b, 1), jnp.float32)
        y_fake = jnp.zeros((b, 1), jnp.float32)

        # Shared generator forward with pullback for phase B (the reference
        # shares u_pred_sr across both phases the same way).
        outputs, u_vjp = jax.vjp(
            lambda p: generator_forward(p, batch), state.u_params
        )
        sr_d = jax.lax.stop_gradient(sr_of(outputs))

        # Phase A: critic update on detached SR.
        (c_loss, new_sn), c_grads = jax.value_and_grad(critic_loss, has_aux=True)(
            state.c_params, state.sn_state, sr_d, batch["y"], y_real, y_fake
        )
        c_updates, c_opt_state = c_optimizer.update(
            c_grads, state.c_opt_state, state.c_params
        )
        c_params = optax.apply_updates(state.c_params, c_updates)
        metrics = {
            "critic_bce": c_loss,
            "critic_grad_norm": optax.global_norm(c_grads),
        }

        if warmup:
            return (
                GanTrainState(
                    state.u_params,
                    state.u_opt_state,
                    c_params,
                    c_opt_state,
                    new_sn,
                    state.step + 1,
                ),
                metrics,
            )

        # Phase B: generator update through the (just-updated) critic.
        (_, aux), d_outputs = jax.value_and_grad(
            gen_outputs_loss, argnums=0, has_aux=True
        )(outputs, c_params, new_sn, batch, y_real, y_fake)
        (u_grads,) = u_vjp(d_outputs)
        u_updates, u_opt_state = u_optimizer.update(
            u_grads, state.u_opt_state, state.u_params
        )
        u_params = optax.apply_updates(state.u_params, u_updates)
        metrics.update(aux)
        metrics["upscaler_grad_norm"] = optax.global_norm(u_grads)

        return (
            GanTrainState(
                u_params, u_opt_state, c_params, c_opt_state, new_sn, state.step + 1
            ),
            metrics,
        )

    return step


def make_finetune_step(
    model_cfg: _unet.MewZoomConfig,
    critic_cfg: _bouncer.BouncerConfig,
    u_optimizer: optax.GradientTransformation,
    c_optimizer: optax.GradientTransformation,
    remat: bool = False,
    compute_dtype=None,
    feature_match_weight: float = 1.0,
    adversarial_weight: float = 1.0,
    pixel_weight: float = 1.0,
) -> Callable:
    """Stage-2 GAN step for the 0.3.0 U-Net: the shared two-phase recipe
    plus the QA/degradation generator term (see :func:`_make_gan_step`)."""

    def generator_forward(u_params, batch):
        mat = materialize(u_params)
        return _unet.apply(
            mat, batch["x"], model_cfg, remat=remat, compute_dtype=compute_dtype
        )

    return _make_gan_step(
        generator_forward,
        sr_of=lambda outputs: outputs[0],
        extra_gen_terms=lambda outputs, batch: [
            ("degradation_l2", _mse(outputs[1], batch["y_deg"]))
        ],
        u_optimizer=u_optimizer,
        c_optimizer=c_optimizer,
        remat=remat,
        compute_dtype=compute_dtype,
        feature_match_weight=feature_match_weight,
        adversarial_weight=adversarial_weight,
        pixel_weight=pixel_weight,
    )


def make_ctrl_finetune_step(
    model_cfg,
    critic_cfg: _bouncer.BouncerConfig,
    u_optimizer: optax.GradientTransformation,
    c_optimizer: optax.GradientTransformation,
    remat: bool = False,
    compute_dtype=None,
    feature_match_weight: float = 1.0,
    adversarial_weight: float = 1.0,
    pixel_weight: float = 1.0,
) -> Callable:
    """Stage-2 GAN step for the controllable 0.1.x/0.2.x architecture —
    the family of every published HF checkpoint, which the reference also
    fine-tunes with this two-phase recipe (fine-tune.py:240-330).

    Identical to :func:`make_finetune_step` except the generator is the
    Ctrl model conditioned on the true degradation labels (``c = y_deg``,
    as in pretraining) and the generator loss drops the QA term (this
    architecture has no QA head)."""
    from ultrazoom_tpu.models import ctrl as _ctrl

    def generator_forward(u_params, batch):
        mat = materialize(u_params)
        return _ctrl.apply(
            mat, batch["x"], batch["y_deg"], cfg=model_cfg,
            remat=remat, compute_dtype=compute_dtype,
        )

    return _make_gan_step(
        generator_forward,
        sr_of=lambda outputs: outputs,
        extra_gen_terms=lambda outputs, batch: [],
        u_optimizer=u_optimizer,
        c_optimizer=c_optimizer,
        remat=remat,
        compute_dtype=compute_dtype,
        feature_match_weight=feature_match_weight,
        adversarial_weight=adversarial_weight,
        pixel_weight=pixel_weight,
    )
