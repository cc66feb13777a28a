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


def test_make_demo_dataset_feeds_image_folder(tmp_path):
    from ultrazoom_tpu.data import AugmentConfig, DegradationConfig, ImageFolder
    from ultrazoom_tpu.tools.make_demo_dataset import make_dataset

    tr, te = make_dataset(tmp_path / "ds", n_train=4, n_test=2, size=64, seed=0)
    assert (tr, te) == (4, 2)
    ds = ImageFolder(
        str(tmp_path / "ds" / "train"), 32, 2, DegradationConfig(), AugmentConfig(32)
    )
    assert len(ds) == 4
    import numpy as np

    s = ds[(0, np.random.default_rng(0))]
    assert s["x"].shape == (16, 16, 3) and s["y"].shape == (32, 32, 3)
    assert s["y_deg"].shape == (3,)


def test_channel_pad_is_exact_identity_f32():
    import jax
    import numpy as np
    import jax.numpy as jnp
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.tools.exp_channel_pad import pad_ctrl_params

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=6, num_layers=3)
    params = ctrl.init(jax.random.key(0), cfg)
    padded, pcfg = pad_ctrl_params(params, cfg, 8)
    assert pcfg.num_channels == 8
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 10, 10, 3)), jnp.float32
    )
    c = jnp.asarray([[0.3, 0.6, 0.9], [0.0, 0.2, 1.0]], jnp.float32)
    a = np.asarray(ctrl.apply(params, x, c, cfg=cfg))
    b = np.asarray(ctrl.apply(padded, x, c, cfg=pcfg))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_make_validation_pairs_roundtrip(tmp_path):
    import numpy as np
    from PIL import Image

    from ultrazoom_tpu.data import ImagePairs
    from ultrazoom_tpu.tools.make_demo_dataset import make_validation_pairs

    hr = tmp_path / "hr_src"
    hr.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            (rng.uniform(0, 1, (37, 41, 3)) * 255).astype(np.uint8)
        ).save(hr / f"im{i}.png")
    n = make_validation_pairs(hr, tmp_path / "pairs", ratio=3)
    assert n == 3
    ds = ImagePairs(str(tmp_path / "pairs" / "lr"), str(tmp_path / "pairs" / "hr"))
    pair = ds[0]
    assert pair["y"].shape == (36, 39, 3)  # cropped to multiple of 3
    assert pair["x"].shape == (12, 13, 3)
