"""Golden tests: resize ops vs torch-core reference (F.interpolate)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ultrazoom_tpu.ops import resize2d, upsample2d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_nchw(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=shape).astype(np.float32)


def _torch_interp(x_nchw, size, mode, antialias=False):
    t = torch.from_numpy(x_nchw)
    out = F.interpolate(t, size=size, mode=mode, antialias=antialias)
    return out.numpy()


def _ours(x_nchw, size, method, antialias=False):
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    y = resize2d(x, size, method=method, antialias=antialias)
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("scale", [2, 3, 4, 8])
def test_bicubic_upsample_matches_torch(scale):
    x = _rand_nchw((2, 3, 17, 23))
    ref = _torch_interp(x, (17 * scale, 23 * scale), "bicubic")
    got = _ours(x, (17 * scale, 23 * scale), "bicubic")
    np.testing.assert_allclose(got, ref, atol=5e-6, rtol=0)


def test_upsample2d_helper_matches_torch_upsample():
    x = _rand_nchw((1, 3, 32, 32), seed=3)
    ref = _torch_interp(x, (128, 128), "bicubic")
    got = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = np.transpose(np.asarray(upsample2d(got, 4)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=5e-6, rtol=0)


@pytest.mark.parametrize("mode,method", [("bilinear", "bilinear"), ("bicubic", "bicubic")])
def test_downsample_no_antialias_matches_torch(mode, method):
    x = _rand_nchw((2, 3, 64, 48), seed=1)
    ref = _torch_interp(x, (23, 17), mode)
    got = _ours(x, (23, 17), method)
    np.testing.assert_allclose(got, ref, atol=5e-6, rtol=0)


@pytest.mark.parametrize("mode,method", [("bilinear", "bilinear"), ("bicubic", "bicubic")])
def test_downsample_antialias_matches_torchvision_semantics(mode, method):
    # F.interpolate(antialias=True) == torchvision Resize semantics.
    x = _rand_nchw((2, 3, 64, 48), seed=2)
    ref = _torch_interp(x, (16, 12), mode, antialias=True)
    got = _ours(x, (16, 12), method, antialias=True)
    np.testing.assert_allclose(got, ref, atol=5e-6, rtol=0)


def test_nearest_matches_torch():
    x = _rand_nchw((1, 3, 64, 64), seed=4)
    ref = _torch_interp(x, (31, 31), "nearest")
    got = _ours(x, (31, 31), "nearest")
    np.testing.assert_allclose(got, ref, atol=0, rtol=0)


def test_nearest_exact_matches_torch():
    x = _rand_nchw((1, 3, 64, 64), seed=5)
    ref = _torch_interp(x, (31, 31), "nearest-exact")
    got = _ours(x, (31, 31), "nearest_exact")
    np.testing.assert_allclose(got, ref, atol=0, rtol=0)


def test_identity_resize_is_noop():
    x = _rand_nchw((1, 3, 16, 16))
    got = _ours(x, (16, 16), "bicubic")
    np.testing.assert_allclose(got, x, atol=0)
