"""End-to-end CLI smoke tests on a tiny synthetic dataset.

The reference has no training-loop or integration tests (SURVEY.md
section 4); these close that gap: pretrain runs + checkpoints + resumes,
fine-tune runs both phases, and the validate/test-compare tools work on
real files.
"""

import json
import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast default subset

TINY_MODEL_FLAGS = [
    "--num_primary_channels", "8", "--num_primary_layers", "2",
    "--num_secondary_channels", "12", "--num_secondary_layers", "2",
    "--num_tertiary_channels", "16", "--num_tertiary_layers", "2",
    "--num_quaternary_channels", "24", "--num_quaternary_layers", "2",
]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("test", 2)):
        d = root / split
        d.mkdir()
        for i in range(n):
            # Smooth-ish images so SR has signal.
            base = rng.uniform(0, 1, (6, 6, 3))
            img = np.kron(base, np.ones((8, 8, 1)))[:40, :40]
            arr = (img * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return root


def test_pretrain_cli_end_to_end(dataset, tmp_path):
    from ultrazoom_tpu.train.pretrain import main

    ckpt = tmp_path / "ck"
    runs = tmp_path / "runs"
    args = [
        "--train_images_path", str(dataset / "train"),
        "--test_images_path", str(dataset / "test"),
        "--target_resolution", "32",
        "--upscale_ratio", "2",
        "--batch_size", "4",
        "--gradient_accumulation_steps", "1",
        "--num_epochs", "2",
        "--eval_interval", "2",
        "--checkpoint_interval", "1",
        "--checkpoint_path", str(ckpt),
        "--run_dir_path", str(runs),
        "--seed", "0",
        "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
        *TINY_MODEL_FLAGS,
    ]
    main(args)

    assert (ckpt / "meta.json").exists()
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 2
    events = (runs / "events.jsonl").read_text().strip().splitlines()
    tags = {json.loads(e)["tag"] for e in events}
    assert "train/loss" in tags and "eval/psnr" in tags

    # Resume for one more epoch.
    main(args[:args.index("2", args.index("--num_epochs"))] + ["3"] +
         args[args.index("--eval_interval"):] + ["--resume"])
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 3

    # Supervisor-retry of a finished run: the resume-complete fast path
    # must exit without touching the checkpoint (and without the dataset/
    # device-cache setup that can outlast the hang watchdog).
    before = (ckpt / "meta.json").read_text()
    main(args[:args.index("2", args.index("--num_epochs"))] + ["3"] +
         args[args.index("--eval_interval"):] + ["--resume"])
    assert (ckpt / "meta.json").read_text() == before


def test_pretrain_cli_ctrl_arch(dataset, tmp_path):
    """--arch ctrl trains the controllable 0.2.x family (restores the
    reference's 0.2.x --num_channels/--num_encoder_layers CLI surface,
    README.md:254-257) end-to-end: train, eval, checkpoint."""
    from ultrazoom_tpu.train.pretrain import main

    ckpt = tmp_path / "ck"
    runs = tmp_path / "runs"
    main([
        "--train_images_path", str(dataset / "train"),
        "--test_images_path", str(dataset / "test"),
        "--arch", "ctrl",
        "--num_channels", "8",
        "--num_encoder_layers", "2",
        "--target_resolution", "30",
        "--upscale_ratio", "3",  # x3 only exists in the Ctrl family
        "--batch_size", "4",
        "--gradient_accumulation_steps", "1",
        "--num_epochs", "2",
        "--eval_interval", "2",
        "--checkpoint_interval", "2",
        "--checkpoint_path", str(ckpt),
        "--run_dir_path", str(runs),
        "--seed", "0",
        "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ])
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 2
    assert meta["architecture"] == "mewzoom-ctrl"
    events = (runs / "events.jsonl").read_text().strip().splitlines()
    tags = {json.loads(e)["tag"] for e in events}
    assert "train/loss" in tags and "eval/psnr" in tags

    # The checkpoint params restore into the functional Ctrl model.
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.utils import restore_params_only
    import jax

    cfg = ctrl.MewZoomCtrlConfig.from_dict(meta["upscaler_args"])
    params = restore_params_only(ckpt, ctrl.init(jax.random.key(0), cfg))
    x = np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    out = ctrl.upscale(params, x, None, cfg=cfg)
    assert out.shape == (1, 24, 24, 3)


def test_ctrl_pretrain_step_loss_decreases():
    """Tiny Ctrl train loop on synthetic data: loss goes down."""
    import jax
    import jax.numpy as jnp
    from ultrazoom_tpu.losses import init_vgg19_features
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.train import (
        TrainState, make_ctrl_pretrain_step, make_optimizer,
    )

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    params = ctrl.init(jax.random.key(0), cfg)
    vgg = init_vgg19_features(seed=0)
    opt = make_optimizer(1e-3, 1.0)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_ctrl_pretrain_step(cfg, opt, vgg))

    rng = np.random.default_rng(1)
    base = rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)
    batch = {
        "x": base,
        "y": np.repeat(np.repeat(base, 2, 1), 2, 2),
        "y_deg": rng.uniform(0, 1, (4, 3)).astype(np.float32),
    }
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["pixel_l2"]))
    assert losses[-1] < losses[0]


def test_finetune_cli_end_to_end(dataset, tmp_path):
    from ultrazoom_tpu.train.finetune import main as ft_main
    from ultrazoom_tpu.train.pretrain import main as pt_main

    base = tmp_path / "base"
    pt_main([
        "--train_images_path", str(dataset / "train"),
        "--test_images_path", str(dataset / "test"),
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--num_epochs", "1", "--eval_interval", "10",
        "--checkpoint_interval", "1",
        "--checkpoint_path", str(base),
        "--run_dir_path", str(tmp_path / "runs1"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
        *TINY_MODEL_FLAGS,
    ])

    ft_main([
        "--base_checkpoint_path", str(base),
        "--train_images_path", str(dataset / "train"),
        "--test_images_path", str(dataset / "test"),
        "--target_resolution", "32",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--num_epochs", "2", "--critic_warmup_epochs", "1",
        "--eval_interval", "2", "--checkpoint_interval", "2",
        "--best_checkpoint_metric", "psnr",
        "--checkpoint_path", str(tmp_path / "ft"),
        "--run_dir_path", str(tmp_path / "runs2"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ])
    meta = json.loads((tmp_path / "ft" / "meta.json").read_text())
    assert meta["epoch"] == 2
    events = (tmp_path / "runs2" / "events.jsonl").read_text().strip().splitlines()
    tags = {json.loads(e)["tag"] for e in events}
    assert "finetune/critic_bce" in tags
    assert "finetune/upscaler_bce" in tags  # phase B ran after warmup
    assert "eval/critic_f1" in tags

    # Best-eval snapshot: GAN evals oscillate, so the shippable state is
    # the best epoch, not the last. One eval ran (epoch 2) -> one best.
    best_meta = json.loads((tmp_path / "ft_best" / "meta.json").read_text())
    assert best_meta["best_metric"] == "psnr"
    assert best_meta["epoch"] == 2
    assert np.isfinite(best_meta["best_value"])
    assert (tmp_path / "ft_best" / "state.npz").exists()


def test_pretrain_pixel_mode_and_init_from(dataset, tmp_path):
    """--loss_combiner pixel (no VGG towers) and --init_params_from
    (polish continuation from an earlier checkpoint)."""
    from ultrazoom_tpu.train.pretrain import main

    common = [
        "--train_images_path", str(dataset / "train"),
        "--test_images_path", str(dataset / "test"),
        "--arch", "ctrl", "--num_channels", "8", "--num_encoder_layers", "2",
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--num_epochs", "1", "--eval_interval", "10",
        "--checkpoint_interval", "1",
        "--run_dir_path", str(tmp_path / "runs"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ]
    base = tmp_path / "base"
    main(common + ["--checkpoint_path", str(base)])

    polish = tmp_path / "polish"
    main(common + [
        "--checkpoint_path", str(polish),
        "--loss_combiner", "pixel",
        "--init_params_from", str(base),
    ])
    meta = json.loads((polish / "meta.json").read_text())
    assert meta["epoch"] == 1 and meta["loss_combiner"] == "pixel"
    events = (tmp_path / "runs" / "events.jsonl").read_text().strip().splitlines()
    tags = {json.loads(e)["tag"] for e in events}
    assert "train/pixel_l2" in tags


def test_finetune_cli_ctrl_arch(dataset, tmp_path):
    """GAN fine-tune dispatches on the base checkpoint's architecture:
    a --arch ctrl pretrain checkpoint fine-tunes the Ctrl generator (the
    published-checkpoint family) with the same two-phase recipe."""
    from ultrazoom_tpu.train.finetune import main as ft_main
    from ultrazoom_tpu.train.pretrain import main as pt_main

    base = tmp_path / "base"
    pt_main([
        "--train_images_path", str(dataset / "train"),
        "--test_images_path", str(dataset / "test"),
        "--arch", "ctrl", "--num_channels", "8", "--num_encoder_layers", "2",
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--num_epochs", "1", "--eval_interval", "10",
        "--checkpoint_interval", "1",
        "--checkpoint_path", str(base),
        "--run_dir_path", str(tmp_path / "runs1"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ])

    ft_main([
        "--base_checkpoint_path", str(base),
        "--train_images_path", str(dataset / "train"),
        "--test_images_path", str(dataset / "test"),
        "--target_resolution", "32",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--num_epochs", "2", "--critic_warmup_epochs", "1",
        "--eval_interval", "2", "--checkpoint_interval", "2",
        "--checkpoint_path", str(tmp_path / "ft"),
        "--run_dir_path", str(tmp_path / "runs2"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ])
    meta = json.loads((tmp_path / "ft" / "meta.json").read_text())
    assert meta["epoch"] == 2
    assert meta["architecture"] == "mewzoom-ctrl"
    events = (tmp_path / "runs2" / "events.jsonl").read_text().strip().splitlines()
    tags = {json.loads(e)["tag"] for e in events}
    assert "finetune/critic_bce" in tags
    assert "finetune/upscaler_bce" in tags  # ctrl phase B ran after warmup
    assert "eval/critic_f1" in tags

    # The fine-tuned checkpoint exports through the arch-dispatching loader.
    from ultrazoom_tpu.tools.export import load_model_from_train_checkpoint

    model, meta2 = load_model_from_train_checkpoint(tmp_path / "ft")
    x = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    assert model.upscale(x).shape == (16, 16, 3)


def test_validate_and_compare_tools(tmp_path):
    from PIL import Image

    from ultrazoom_tpu.models import MewZoomCtrl
    from ultrazoom_tpu.tools.test_compare import main as tc_main
    from ultrazoom_tpu.tools.validate import main as val_main

    model = MewZoomCtrl.from_config(
        MewZoomCtrl.Config(upscale_ratio=2, num_channels=8, num_layers=2), seed=0
    )
    mdir = tmp_path / "model"
    model.save_pretrained(mdir)

    rng = np.random.default_rng(1)
    (tmp_path / "lr").mkdir()
    (tmp_path / "hr").mkdir()
    for i in range(2):
        hr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        lr = hr[::2, ::2]
        Image.fromarray(lr).save(tmp_path / "lr" / f"{i}.png")
        Image.fromarray(hr).save(tmp_path / "hr" / f"{i}.png")

    val_main([
        "--model_path", str(mdir),
        "--lr_images_path", str(tmp_path / "lr"),
        "--hr_images_path", str(tmp_path / "hr"),
        "--compute_dtype", "float32",
    ])

    out = tmp_path / "cmp.png"
    tc_main([
        "--image_path", str(tmp_path / "lr" / "0.png"),
        "--model_path", str(mdir),
        "--output_path", str(out),
        "--compute_dtype", "float32",
    ])
    assert out.exists()
    w, h = Image.open(out).size
    assert (w, h) == (32 + 8 + 32, 32)
