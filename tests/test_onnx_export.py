"""ONNX round-trip (tools/export_onnx.py), U-Net family.

Steps 1-3 (HF dir -> reference torch model strict -> torch.onnx.export ->
structural gate) run fully in this environment: the TorchScript exporter's
ModelProto serialization is C++-side, so no python onnx package is needed
(the dynamo path of the reference notebook is used when onnx/onnxscript
ARE installed).  Only the ORT numeric session (step 4) stays dep-gated.
Ctrl-family export lives in tests/test_onnx_ctrl_export.py.
"""

import numpy as np
import pytest

from reference_oracle import reference_available
from ultrazoom_tpu.models import MewZoom, MewZoomCtrl, unet

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference snapshot or torch unavailable"
)

REF_SRC = "/root/reference"


def _tiny_export(tmp_path, seed=31):
    cfg = unet.MewZoomConfig(
        upscale_ratio=2,
        primary_channels=8, primary_layers=2,
        secondary_channels=12, secondary_layers=2,
        tertiary_channels=16, tertiary_layers=2,
        quaternary_channels=24, quaternary_layers=2,
    )
    model = MewZoom.from_config(cfg, seed=seed)
    model.save_pretrained(tmp_path / "export")
    return model, tmp_path / "export"


def test_build_reference_model_from_our_export(tmp_path):
    from ultrazoom_tpu.tools.export_onnx import build_reference_model

    jax_model, export_dir = _tiny_export(tmp_path)
    ref_model, config = build_reference_model(export_dir, reference_src=REF_SRC)

    x = np.random.default_rng(31).uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    with torch.inference_mode():
        want = ref_model.upscale(torch.from_numpy(x)).numpy()
    got = np.asarray(jax_model.upscale(x))
    np.testing.assert_allclose(
        np.transpose(got[0], (2, 0, 1)), want[0], atol=1e-4, rtol=1e-4
    )


def test_onnx_export_unet_end_to_end(tmp_path):
    """Full U-Net chain through the reference torch model: a real .onnx is
    produced (with or without the onnx package) and passes the structural
    gate; parse it back with the pure-python reader."""
    from ultrazoom_tpu.convert.onnx_reader import read_onnx
    from ultrazoom_tpu.tools.export_onnx import export_onnx

    _, export_dir = _tiny_export(tmp_path, seed=32)
    out = tmp_path / "model.onnx"
    path = export_onnx(export_dir, out, reference_src=REF_SRC, image_size=16)
    assert (tmp_path / "model.onnx").exists(), path
    s = read_onnx(out)
    # Snapshot ONNXModel interface: single input, clamp in-graph.
    assert [v["name"] for v in s.inputs] == ["x"]
    assert s.op_counts.get("Clip", 0) >= 1
    assert s.op_counts.get("Conv", 0) >= 10


def test_ctrl_arch_loads_torch_reconstruction(tmp_path):
    """Ctrl exports build our torch 0.2.x reconstruction (the snapshot has
    no source for that generation) rather than being rejected."""
    from ultrazoom_tpu.tools.export_onnx import build_reference_model

    m = MewZoomCtrl.from_config(
        MewZoomCtrl.Config(upscale_ratio=2, num_channels=8, num_layers=2), seed=33
    )
    m.save_pretrained(tmp_path / "ctrl")
    tm, config = build_reference_model(tmp_path / "ctrl", reference_src=REF_SRC)
    assert tm.controllable and config["num_layers"] == 2
