"""Reverse interop: a JAX-trained model exported with save_pretrained must
load into the original torch reference model (strict key match) and produce
the same outputs — the contract that lets reference users adopt this
framework without abandoning their torch tooling."""

import numpy as np
import pytest
import jax

from reference_oracle import build_reference_mewzoom, reference_available
from ultrazoom_tpu.models import MewZoom, unet

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference snapshot or torch unavailable"
)


def test_jax_export_loads_into_reference_torch_model(tmp_path):
    import torch
    from safetensors.torch import load_file

    # Fresh JAX model, exported HF-style.
    ref_model, args = build_reference_mewzoom(seed=21)
    cfg = unet.MewZoomConfig.from_dict(args)
    model = MewZoom.from_config(cfg, seed=21)
    model.save_pretrained(tmp_path / "export")

    sd = load_file(str(tmp_path / "export" / "model.safetensors"))
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not missing, f"missing keys in export: {missing[:5]}"
    assert not unexpected, f"unexpected keys in export: {unexpected[:5]}"

    rng = np.random.default_rng(21)
    x = rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    ref_model.eval()
    with torch.inference_mode():
        want = ref_model.upscale(torch.from_numpy(x)).numpy()
    got = np.asarray(model.upscale(x))  # NCHW in -> NHWC out
    np.testing.assert_allclose(
        np.transpose(got[0], (2, 0, 1)), want[0], atol=1e-4, rtol=1e-4
    )
