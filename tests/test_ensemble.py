"""Tests: x8 geometric self-ensemble (engine/ensemble.py).

The reference has no TTA mode; correctness here is pinned by group
properties (exact round-trips, exact no-op on an equivariant operator)
and by equivalence with a naive 8-call loop on the real models.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ultrazoom_tpu.engine import TiledUpscaler
from ultrazoom_tpu.engine.ensemble import (
    DIHEDRAL,
    make_self_ensemble,
    transform,
    untransform,
)
from ultrazoom_tpu.models import MewZoom, MewZoomCtrl, ctrl, unet
from ultrazoom_tpu.ops import upsample2d


def _tiny_unet(seed=0, ratio=2):
    cfg = unet.MewZoomConfig(
        upscale_ratio=ratio,
        primary_channels=8,
        primary_layers=2,
        secondary_channels=12,
        secondary_layers=2,
        tertiary_channels=16,
        tertiary_layers=2,
        quaternary_channels=24,
        quaternary_layers=2,
    )
    return MewZoom.from_config(cfg, seed=seed)


def _naive_ensemble(fn, x):
    outs = [untransform(fn(transform(x, k, f)), k, f) for k, f in DIHEDRAL]
    return sum(outs) / len(outs)


def test_transform_roundtrip_all_eight():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 5, 9, 3)).astype(np.float32))
    assert len(DIHEDRAL) == len(set(DIHEDRAL)) == 8
    for k, f in DIHEDRAL:
        np.testing.assert_array_equal(untransform(transform(x, k, f), k, f), x)


def test_transforms_are_distinct_group_elements():
    # All 8 views of an asymmetric image differ pairwise (D4 acts freely).
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    views = [np.asarray(transform(x, k, f)) for k, f in DIHEDRAL]
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.array_equal(views[i], views[j])


@pytest.mark.parametrize("shape", [(1, 16, 16, 3), (2, 12, 20, 3)])
def test_ensemble_is_noop_on_equivariant_operator(shape):
    """Bicubic upsampling commutes with D4, so its self-ensemble is itself —
    square (one 8x-batch call) and non-square (two 4x calls) paths."""
    fn = lambda x: upsample2d(x, 2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    np.testing.assert_allclose(
        make_self_ensemble(fn)(x), fn(x), atol=1e-5, rtol=0
    )


@pytest.mark.parametrize("shape", [(1, 24, 24, 3), (1, 16, 24, 3)])
def test_ensemble_matches_naive_loop_unet(shape):
    model = _tiny_unet()
    fn = model._jitted("upscale", None)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
    got = make_self_ensemble(fn)(x)
    want = _naive_ensemble(fn, x)
    assert got.shape == (shape[0], shape[1] * 2, shape[2] * 2, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_api_self_ensemble_unet():
    model = _tiny_unet()
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (20, 28, 3)).astype(np.float32)
    plain = np.asarray(model.upscale(img))
    se = np.asarray(model.upscale(img, self_ensemble=True))
    assert se.shape == plain.shape
    naive = np.asarray(
        _naive_ensemble(model._jitted("upscale", None), jnp.asarray(img)[None])
    )[0]
    np.testing.assert_allclose(se, naive, atol=2e-5, rtol=0)


def test_api_self_ensemble_ctrl_per_image_control_rows():
    """Batched SE must tile per-image control rows in transform-major order:
    each image's ensemble must equal its own single-image ensemble."""
    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    model = MewZoomCtrl.from_config(cfg, seed=0)
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    c = np.asarray([[0.1, 0.2, 0.3], [0.9, 0.0, 0.5]], np.float32)
    batched = np.asarray(model.upscale(x, c, self_ensemble=True))
    for i in range(2):
        single = np.asarray(model.upscale(x[i], c[i], self_ensemble=True))
        np.testing.assert_allclose(batched[i], single, atol=2e-5, rtol=0)


def test_tiled_self_ensemble_exact_on_equivariant_fn():
    scale = 2
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    plain = TiledUpscaler(lambda x: upsample2d(x, scale), scale, tile=32, overlap=8)
    se = TiledUpscaler(
        lambda x: upsample2d(x, scale), scale, tile=32, overlap=8,
        self_ensemble=True,
    )
    np.testing.assert_allclose(se(img), plain(img), atol=1e-5, rtol=0)


def test_tiled_mesh_sharded_self_ensemble_matches_single_device():
    """Mesh-sharded tiling x self-ensemble composed: the SE wrapper turns a
    tile batch of B (sharded over the data axis) into an 8B device call —
    exactly the kind of composition that breaks only composed."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    model = _tiny_unet(seed=7)
    fn = model._jitted("upscale", None)
    img = np.random.default_rng(7).uniform(0, 1, (33, 47, 3)).astype(np.float32)
    single = TiledUpscaler(
        fn, 2, tile=16, overlap=4, tile_batch=len(devs), self_ensemble=True
    )(img)
    sharded = TiledUpscaler(
        fn, 2, tile=16, overlap=4, tile_batch=len(devs), mesh=mesh,
        self_ensemble=True,
    )(img)
    assert sharded.shape == (66, 94, 3)
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=0)


def test_serve_self_ensemble_smoke():
    from ultrazoom_tpu.engine.serve import UpscaleService

    scale = 2
    svc = UpscaleService(
        lambda x: upsample2d(x, scale), scale, tile=16, overlap=4,
        tile_batch=2, self_ensemble=True,
    )
    try:
        rng = np.random.default_rng(6)
        img = rng.uniform(0, 1, (20, 24, 3)).astype(np.float32)
        out = svc.upscale(img)
        assert out.shape == (40, 48, 3)
        want = np.asarray(upsample2d(jnp.asarray(img)[None], scale))[0]
        np.testing.assert_allclose(
            out[8:-8, 8:-8], want[8:-8, 8:-8], atol=1e-5, rtol=0
        )
    finally:
        svc.close()
