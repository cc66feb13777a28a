"""Ctrl-family ONNX deployment chain (tools/export_onnx.py +
convert/ctrl_torch.py + convert/onnx_reader.py), fully exercised without
the onnx package: HF export dir -> torch Ctrl reconstruction (strict) ->
TorchScript ONNX serialization (C++-side proto) -> pure-python structural
gate.  Numeric fidelity is gated torch-vs-JAX (the ONNX graph is a direct
trace of that torch module; the ORT run itself needs onnxruntime,
dep-gated in tools/export_onnx.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_export(tmp_path_factory):
    from ultrazoom_tpu.models.api import MewZoomCtrl

    m = MewZoomCtrl.from_config(
        upscale_ratio=3, num_channels=6, num_layers=2, seed=3
    )
    out = tmp_path_factory.mktemp("exp") / "tiny-ctrl"
    m.save_pretrained(out)
    return m, out


def test_torch_ctrl_matches_jax(tiny_export):
    """The torch reconstruction loads our export strict and reproduces the
    JAX forward (f64-ish CPU tolerance; same bicubic a=-0.75 skip, FiLM
    placement, pixel-shuffle order)."""
    from ultrazoom_tpu.convert.ctrl_torch import load_torch_ctrl_pretrained

    m, out = tiny_export
    tm, config = load_torch_ctrl_pretrained(out)
    assert config["num_channels"] == 6

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    c = np.asarray([[0.5, 0.2, 0.3], [0.0, 1.0, 0.4]], np.float32)

    want = np.asarray(m.upscale(x, c))
    got = (
        tm.upscale(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(c))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    psnr = -10 * np.log10(np.mean((want - got) ** 2) + 1e-12)
    assert psnr > 50, psnr  # CPU f32 both sides


def test_export_onnx_ctrl_end_to_end(tiny_export, tmp_path):
    from ultrazoom_tpu.convert.onnx_reader import read_onnx
    from ultrazoom_tpu.tools.export_onnx import export_onnx

    _, exp_dir = tiny_export
    out = tmp_path / "tiny.onnx"
    export_onnx(exp_dir, out, image_size=12)
    s = read_onnx(out)
    assert s.ir_version >= 7
    assert s.opset.get("", 0) >= 10  # DepthToSpace CRD mode
    assert [v["name"] for v in s.inputs] == ["x", "c"]
    # Dynamic batch/H/W survive serialization as symbolic dims.
    xshape = s.inputs[0]["shape"]
    assert xshape[0] == "batch" and xshape[1] == 3
    assert xshape[2] == "height" and xshape[3] == "width"
    counts = s.op_counts
    assert counts.get("Conv", 0) >= 2 + 2 * 2  # stem + tail + 2 convs/layer
    assert counts.get("DepthToSpace", 0) == 1  # pixel-shuffle tail
    assert counts.get("Clip", 0) == 1  # upscale clamp in-graph
    assert any(op in counts for op in ("Resize", "Upsample"))  # bicubic skip
    # All weights present: initializer elements >= model params.
    n_init = sum(int(np.prod(t["dims"])) for t in s.initializers)
    assert n_init >= 6 * 3 + 6 * 12 * 9 * 2 * 2


def test_export_onnx_non_controllable(tmp_path):
    """Non-Ctrl family exports a single-input graph."""
    from ultrazoom_tpu.convert.onnx_reader import read_onnx
    from ultrazoom_tpu.models.api import MewZoomCtrl
    from ultrazoom_tpu.tools.export_onnx import export_onnx

    m = MewZoomCtrl.from_config(
        upscale_ratio=2, num_channels=6, num_layers=2, controllable=False
    )
    m.save_pretrained(tmp_path / "nc")
    out = tmp_path / "nc.onnx"
    export_onnx(tmp_path / "nc", out, image_size=10)
    s = read_onnx(out)
    assert [v["name"] for v in s.inputs] == ["x"]


def test_shipped_artifact_onnx_is_valid():
    """The checked-in deployment artifact parses and carries the full 1.7M
    params of the shipped 2X model."""
    import pathlib

    from ultrazoom_tpu.convert.onnx_reader import read_onnx

    p = pathlib.Path("artifacts/mewzoom-tpu-2x-ctrl/model.onnx")
    if not p.exists():
        pytest.skip("shipped artifact not present")
    s = read_onnx(p)
    assert s.opset.get("", 0) >= 10
    assert [v["name"] for v in s.inputs] == ["x", "c"]
    n_init = sum(int(np.prod(t["dims"])) for t in s.initializers)
    assert n_init >= 1_679_616
