"""Golden tests: conv2d / pixel shuffle / crop-pad vs torch core."""

import numpy as np
import pytest
import jax.numpy as jnp

from ultrazoom_tpu.ops import conv2d, crop_or_pad_to, pixel_shuffle, pixel_unshuffle

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _oihw_to_hwio(w):
    return np.transpose(w, (2, 3, 1, 0))


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,groups",
    [
        (3, 16, 1, 1, 0, 1),     # stem fan-out
        (8, 16, 3, 1, 1, 1),     # bottleneck conv
        (8, 12, 2, 2, 0, 1),     # pixel crush k=s=2
        (6, 10, 3, 3, 0, 1),     # pixel crush k=s=3
        (8, 8, 7, 1, 3, 8),      # depthwise k7
        (16, 4, 3, 1, 1, 1),     # qa head
    ],
)
def test_conv2d_matches_torch(cin, cout, k, stride, padding, groups):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, cin, 21, 19)).astype(np.float32)
    w = rng.normal(size=(cout, cin // groups, k, k)).astype(np.float32) * 0.1
    b = rng.normal(size=(cout,)).astype(np.float32)

    ref = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=padding, groups=groups,
    ).numpy()

    got = conv2d(
        jnp.asarray(_nchw_to_nhwc(x)),
        jnp.asarray(_oihw_to_hwio(w)),
        jnp.asarray(b),
        stride=stride,
        padding=padding,
        groups=groups,
    )
    np.testing.assert_allclose(_nhwc_to_nchw(np.asarray(got)), ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("r", [2, 3, 4])
def test_pixel_shuffle_matches_torch(r):
    rng = np.random.default_rng(1)
    c = 5
    x = rng.normal(size=(2, c * r * r, 7, 9)).astype(np.float32)
    ref = F.pixel_shuffle(torch.from_numpy(x), r).numpy()
    got = pixel_shuffle(jnp.asarray(_nchw_to_nhwc(x)), r)
    np.testing.assert_allclose(_nhwc_to_nchw(np.asarray(got)), ref, atol=0)


@pytest.mark.parametrize("r", [2, 3])
def test_pixel_unshuffle_roundtrip(r):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6 * r * r, 8, 8)).astype(np.float32))
    x = jnp.transpose(x, (0, 2, 3, 1))
    y = pixel_unshuffle(pixel_shuffle(x, r), r)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0)


@pytest.mark.parametrize(
    "in_hw,target",
    [((10, 10), (8, 8)), ((7, 9), (9, 7)), ((5, 5), (5, 5)), ((6, 11), (8, 8))],
)
def test_crop_or_pad_matches_reference_semantics(in_hw, target):
    """Reference: Decoder.crop_feature_maps (src/ultrazoom/model.py:650-689)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 4, *in_hw)).astype(np.float32)

    t = torch.from_numpy(x)
    h, w = in_hw
    th, tw = target
    if h > th:
        s = (h - th) // 2
        t = t[:, :, s : s + th, :]
    elif h < th:
        p = th - h
        t = F.pad(t, (0, 0, p // 2, p - p // 2))
    if w > tw:
        s = (w - tw) // 2
        t = t[:, :, :, s : s + tw]
    elif w < tw:
        p = tw - w
        t = F.pad(t, (p // 2, p - p // 2, 0, 0))
    ref = t.numpy()

    got = crop_or_pad_to(jnp.asarray(_nchw_to_nhwc(x)), target)
    np.testing.assert_allclose(_nhwc_to_nchw(np.asarray(got)), ref, atol=0)
