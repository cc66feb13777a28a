"""Numeric execution of exported ONNX artifacts via the pure-numpy
evaluator (convert/onnx_eval.py) — the in-env stand-in for the reference's
ONNX Runtime parity gate (export_model.ipynb cell-11,
``assert_allclose(rtol=1e-2, atol=1e-3)``).

Covers: the shipped 2X Ctrl deployment artifact vs the JAX model; a fresh
tiny Ctrl export vs its torch source trace (tight tolerance); the U-Net
family export (exercising Resize-cubic at ratio 2); and the grouped-conv
kernel vs torch (depthwise convs appear in Bouncer-family exports).
"""

import pathlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

ARTIFACT = pathlib.Path("artifacts/mewzoom-tpu-2x-ctrl")


def _psnr(a, b):
    return -10 * np.log10(np.mean((a - b) ** 2) + 1e-20)


@pytest.mark.skipif(
    not (ARTIFACT / "model.onnx").exists(), reason="shipped artifact absent"
)
def test_shipped_artifact_executes_and_matches_jax():
    from ultrazoom_tpu.convert.onnx_eval import load_onnx_graph, run_onnx
    from ultrazoom_tpu.models.api import MewZoomCtrl

    g = load_onnx_graph(ARTIFACT / "model.onnx")
    assert g.input_names == ["x", "c"]
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 24, 24)).astype(np.float32)
    c = np.asarray([[0.5, 0.05, 0.4]], np.float32)
    got = run_onnx(g, {"x": x, "c": c})[0]
    assert got.shape == (1, 3, 48, 48)

    m = MewZoomCtrl.from_pretrained(ARTIFACT)
    want = np.asarray(
        m.upscale(np.transpose(x[0], (1, 2, 0)), c=c[0], compute_dtype="float32")
    )
    got_hwc = np.transpose(got[0], (1, 2, 0))
    # cell-11's deployment tolerance, and a PSNR far beyond the 40 dB north
    # star (measured ~137 dB on CPU f32 both sides).
    np.testing.assert_allclose(want, got_hwc, rtol=1e-2, atol=1e-3)
    assert _psnr(want, got_hwc) > 80


def test_fresh_ctrl_export_matches_torch_trace(tmp_path):
    """Export a tiny Ctrl model and execute the .onnx: the evaluator must
    reproduce the torch module it was traced from near-bitwise."""
    from ultrazoom_tpu.convert.ctrl_torch import load_torch_ctrl_pretrained
    from ultrazoom_tpu.convert.onnx_eval import load_onnx_graph, run_onnx
    from ultrazoom_tpu.models.api import MewZoomCtrl
    from ultrazoom_tpu.tools.export_onnx import export_onnx

    m = MewZoomCtrl.from_config(upscale_ratio=3, num_channels=6, num_layers=2, seed=5)
    export_dir = tmp_path / "exp"
    m.save_pretrained(export_dir)
    onnx_path = tmp_path / "m.onnx"
    # check=True runs the evaluator gate inside export_onnx (no ORT here).
    export_onnx(export_dir, onnx_path, image_size=16, check=True)

    tm, _ = load_torch_ctrl_pretrained(export_dir)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 3, 11, 13)).astype(np.float32)  # odd sizes
    c = np.asarray([[0.1, 0.9, 0.3], [0.7, 0.0, 0.5]], np.float32)
    with torch.inference_mode():
        want = tm.upscale(torch.from_numpy(x), torch.from_numpy(c)).numpy()
    got = run_onnx(load_onnx_graph(onnx_path), {"x": x, "c": c})[0]
    assert got.shape == want.shape == (2, 3, 33, 39)
    np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)


def test_unet_export_executes(tmp_path):
    """U-Net family graph (Resize-cubic ratio 2, deeper conv stack) executes
    and matches the reference torch module."""
    from reference_oracle import reference_available

    if not reference_available():
        pytest.skip("reference snapshot unavailable")

    from ultrazoom_tpu.convert.onnx_eval import load_onnx_graph, run_onnx
    from ultrazoom_tpu.models import MewZoom, unet
    from ultrazoom_tpu.tools.export_onnx import build_reference_model, export_onnx

    cfg = unet.MewZoomConfig(
        upscale_ratio=2,
        primary_channels=8, primary_layers=2,
        secondary_channels=12, secondary_layers=2,
        tertiary_channels=16, tertiary_layers=2,
        quaternary_channels=24, quaternary_layers=2,
    )
    jm = MewZoom.from_config(cfg, seed=9)
    export_dir = tmp_path / "exp"
    jm.save_pretrained(export_dir)
    onnx_path = tmp_path / "m.onnx"
    export_onnx(
        export_dir, onnx_path, reference_src="/root/reference",
        image_size=32, check=True,
    )

    tm, _ = build_reference_model(export_dir, reference_src="/root/reference")
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    with torch.inference_mode():
        want = tm.upscale(torch.from_numpy(x)).numpy()
    got = run_onnx(load_onnx_graph(onnx_path), {"x": x})[0]
    np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)


def test_grouped_conv_kernel_matches_torch():
    """Depthwise/grouped Conv (Bouncer exports) vs torch, incl. stride,
    dilation and asymmetric padding."""
    from ultrazoom_tpu.convert.onnx_eval import _conv

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 13, 11)).astype(np.float32)
    for group, stride, dil, pads in (
        (1, (1, 1), (1, 1), [1, 1, 1, 1]),
        (8, (1, 1), (1, 1), [3, 3, 3, 3]),  # depthwise k7-style pad
        (2, (2, 2), (1, 1), [1, 0, 0, 1]),
        (4, (1, 2), (2, 1), [2, 1, 2, 1]),
    ):
        kh = kw = 7 if pads == [3, 3, 3, 3] else 3
        w = rng.normal(size=(8, 8 // group, kh, kw)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        got = _conv(
            x, w, b,
            {"group": group, "strides": list(stride),
             "dilations": list(dil), "pads": pads},
        )
        want = torch.nn.functional.conv2d(
            torch.from_numpy(np.pad(
                x, ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3]))
            )),
            torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, dilation=dil, groups=group,
        ).numpy()
        np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)


# ---- wire-level decode + op-semantics regressions (no torch needed) ----

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def _tensor_proto(data_type: int, dims, *, int32_data=None, raw=None) -> bytes:
    """Hand-encoded TensorProto: dims (field 1), data_type (2), packed
    int32_data (5) or raw_data (9)."""
    buf = b""
    for d in dims:
        buf += bytes([0x08]) + _varint(d)
    buf += bytes([0x10]) + _varint(data_type)
    if int32_data is not None:
        payload = b"".join(_varint(v) for v in int32_data)
        buf += bytes([0x2A]) + _varint(len(payload)) + payload
    if raw is not None:
        buf += bytes([0x4A]) + _varint(len(raw)) + raw
    return buf


def test_fp16_typed_storage_is_bitcast():
    """float16 values in int32_data are BIT PATTERNS (onnx.proto), not
    values: 15360 == 0x3C00 == fp16 1.0."""
    from ultrazoom_tpu.convert.onnx_eval import _tensor_value

    arr = _tensor_value(_tensor_proto(10, [2], int32_data=[15360, 16384]))
    np.testing.assert_array_equal(arr.astype(np.float32), [1.0, 2.0])
    # raw_data path: same bits, little-endian uint16.
    arr2 = _tensor_value(
        _tensor_proto(10, [2], raw=np.array([15360, 16384], "<u2").tobytes())
    )
    np.testing.assert_array_equal(arr2.astype(np.float32), [1.0, 2.0])


def test_bfloat16_decodes_via_bit_widening():
    """bfloat16 (data_type 16) has no numpy dtype: the uint16 pattern is
    the top half of a float32.  0x3F80 -> 1.0, 0xC000 -> -2.0."""
    from ultrazoom_tpu.convert.onnx_eval import _tensor_value

    arr = _tensor_value(_tensor_proto(16, [2], int32_data=[0x3F80, 0xC000]))
    assert arr.dtype == np.float32
    np.testing.assert_array_equal(arr, [1.0, -2.0])
    arr2 = _tensor_value(
        _tensor_proto(16, [2], raw=np.array([0x3F80, 0xC000], "<u2").tobytes())
    )
    np.testing.assert_array_equal(arr2, [1.0, -2.0])


def test_integer_div_truncates_toward_zero():
    """ONNX Div on ints is C-style truncation: -7/2 == -3 (numpy // floors
    to -4)."""
    from ultrazoom_tpu.convert.onnx_eval import _int_aware_div

    np.testing.assert_array_equal(
        _int_aware_div(np.int64(-7), np.int64(2)), -3
    )
    np.testing.assert_array_equal(
        _int_aware_div(np.array([-7, 7, -8]), np.array([2, 2, 4])),
        [-3, 3, -2],
    )
    assert _int_aware_div(np.float32(-7), np.float32(2)) == pytest.approx(-3.5)
