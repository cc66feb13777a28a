"""Smoke tests for the analysis/profiling tools."""

import numpy as np
import jax


def test_analyze_tool_prints_arm_gates(tmp_path, capsys):
    from ultrazoom_tpu.models import MewZoomCtrl, MewZoom
    from ultrazoom_tpu.tools.analyze import main

    # UNet has ARM modules; Ctrl (flat body) has none.
    m = MewZoom.from_config(
        MewZoom.Config(
            upscale_ratio=2,
            primary_channels=8, primary_layers=2,
            secondary_channels=12, secondary_layers=2,
            tertiary_channels=16, tertiary_layers=2,
            quaternary_channels=24, quaternary_layers=2,
        ),
        seed=0,
    )
    m.save_pretrained(tmp_path / "m")
    main(["--model_path", str(tmp_path / "m")])
    out = capsys.readouterr().out
    assert "sigmoid(alpha)" in out
    assert "unet.encoder.stage1.0.skip" in out

    c = MewZoomCtrl.from_config(
        MewZoomCtrl.Config(upscale_ratio=2, num_channels=8, num_layers=2), seed=0
    )
    c.save_pretrained(tmp_path / "c")
    main(["--model_path", str(tmp_path / "c")])
    out = capsys.readouterr().out
    assert "No adaptive residual mix" in out


def test_profile_tool_runs(tmp_path, capsys):
    from ultrazoom_tpu.models import MewZoomCtrl
    from ultrazoom_tpu.tools.profile import main

    m = MewZoomCtrl.from_config(
        MewZoomCtrl.Config(upscale_ratio=2, num_channels=8, num_layers=2), seed=0
    )
    m.save_pretrained(tmp_path / "m")
    main([
        "--model_path", str(tmp_path / "m"),
        "--size", "16", "--iters", "1",
        "--trace_dir", str(tmp_path / "traces"),
        "--compute_dtype", "float32",
    ])
    out = capsys.readouterr().out
    assert "ms/iter" in out
