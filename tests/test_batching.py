"""Batch dispatcher (engine/batching.py): value-exact decomposition of
arbitrary batch sizes into anchor shapes, incl. per-sample args and the
padded-remainder path."""

import jax
import jax.numpy as jnp
import numpy as np

from ultrazoom_tpu.engine.batching import dispatch_batched


def test_dispatch_matches_direct_all_sizes():
    from ultrazoom_tpu.models import ctrl

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    params = ctrl.init(jax.random.key(0), cfg)
    fn = jax.jit(lambda x, c: ctrl.upscale(params, x, c, cfg=cfg))
    rng = np.random.default_rng(1)

    calls = []

    def counting(x, c):
        calls.append(x.shape[0])
        return fn(x, c)

    for b in (1, 2, 3, 5, 6, 7, 8, 9, 17):
        x = jnp.asarray(rng.uniform(0, 1, (b, 8, 8, 3)), jnp.float32)
        c = jnp.asarray(rng.uniform(0, 1, (b, 3)), jnp.float32)
        calls.clear()
        got = dispatch_batched(counting, x, c)
        want = fn(x, c)
        assert got.shape == want.shape
        # Per-sample math identical: same weights, batch never couples.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)
        if b in (1, 8):
            assert calls == [b]  # straight through
        else:
            # anchors only: chunks of 8, b1 loop (r<=5) or one padded 8 (r>=6)
            assert set(calls) <= {1, 8}, calls
            r = b % 8
            if r >= 6:
                assert calls.count(8) == b // 8 + 1
            else:
                assert calls.count(8) == b // 8 and calls.count(1) == r


def test_dispatch_none_args():
    fn = lambda x, c: x * 2.0  # c unused (non-controllable path)
    x = jnp.arange(24.0).reshape(6, 2, 2, 1)
    got = dispatch_batched(fn, x, None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x) * 2.0)


def test_api_upscale_uses_dispatch():
    from ultrazoom_tpu.models.api import MewZoomCtrl

    m = MewZoomCtrl.from_config(upscale_ratio=2, num_channels=8, num_layers=2)
    x = np.random.default_rng(0).uniform(0, 1, (3, 8, 8, 3)).astype(np.float32)
    a = m.upscale(x)  # dispatched (default)
    b = m.upscale(x, batch_dispatch=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
