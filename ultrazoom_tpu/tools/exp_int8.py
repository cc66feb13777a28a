"""Experiment: int8 MXU convolution vs bf16 at the Ctrl-body shapes.

The v5e MXU has 2x int8 peak vs bf16 (394 vs 197 TOP/s); the 4X Ctrl body
is MXU-bound at ~56% with bf16 (channel counts 96/192 waste MXU lanes, and
zero-padding to 128 was measured 0.91x — rejected, see ARCHITECTURE.md).
This measures whether XLA:TPU actually engages the int8 path for
``conv_general_dilated`` with int8 operands and int32 accumulation, at the
exact hot shapes of the headline benchmark (batch 8, 512^2, 96->192->96),
including the quantize/rescale overhead a real integer body would pay.

Run: ``python -m ultrazoom_tpu.tools.exp_int8``
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ultrazoom_tpu.ops.conv import DN_NHWC

B, S, C, H = 8, 512, 96, 192
ITERS = 20


def _time(fn, *args) -> float:
    sync = jax.jit(lambda y: (y.reshape(-1)[0]).astype(jnp.float32) * 1.0)
    out = fn(*args)
    float(sync(out))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / ITERS


def conv_bf16(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN_NHWC,
        preferred_element_type=jnp.float32,
    )


def conv_int8(x_q, w_q):
    return lax.conv_general_dilated(
        x_q, w_q, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN_NHWC,
        preferred_element_type=jnp.int32,
    )


def block_bf16(x, w1, w2):
    h = conv_bf16(x, w1)
    h = jax.nn.silu(h.astype(jnp.bfloat16))
    return x + conv_bf16(h, w2).astype(jnp.bfloat16)


def block_int8(x, w1_q, s1, w2_q, s2):
    """One residual block with dynamic per-tensor activation quant and
    per-channel weight scales — the full overhead a real int8 body pays."""
    ax = jnp.max(jnp.abs(x)) / 127.0
    x_q = jnp.round(x.astype(jnp.float32) / ax).astype(jnp.int8)
    h = conv_int8(x_q, w1_q).astype(jnp.float32) * (ax * s1)
    h = jax.nn.silu(h.astype(jnp.bfloat16))
    ah = jnp.max(jnp.abs(h)) / 127.0
    h_q = jnp.round(h.astype(jnp.float32) / ah).astype(jnp.int8)
    y = conv_int8(h_q, w2_q).astype(jnp.float32) * (ah * s2)
    return x + y.astype(jnp.bfloat16)


def main() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, S, S, C)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, H)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, H, C)), jnp.bfloat16)

    def quant_w(w):
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
        return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s

    w1_q, s1 = quant_w(w1)
    w2_q, s2 = quant_w(w2)
    x_q = jnp.round(x.astype(jnp.float32) * 127).astype(jnp.int8)

    flops_c1 = 2 * B * S * S * 9 * C * H

    t = _time(jax.jit(conv_bf16), x, w1)
    print(f"raw conv bf16 {C}->{H}:  {t*1e3:7.2f} ms  {flops_c1/t/1e12:6.1f} TFLOP/s")
    t8 = _time(jax.jit(conv_int8), x_q, w1_q)
    print(f"raw conv int8 {C}->{H}:  {t8*1e3:7.2f} ms  {flops_c1/t8/1e12:6.1f} TOP/s   speedup {t/t8:.2f}x")

    tb = _time(jax.jit(block_bf16), x, w1, w2)
    tb8 = _time(jax.jit(block_int8), x, w1_q, s1, w2_q, s2)
    print(f"residual block bf16:     {tb*1e3:7.2f} ms")
    print(f"residual block int8+dq:  {tb8*1e3:7.2f} ms   speedup {tb/tb8:.2f}x")


if __name__ == "__main__":
    main()
