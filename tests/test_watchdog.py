"""Hang watchdog + auto-resume: operational hardening for remote-attached
accelerators (train/watchdog.py).

The reference's torch loops fail fast on CUDA errors and need neither; a
tunnel-attached TPU backend can silently drop an in-flight RPC, leaving a
trainer wedged at 0% CPU forever.  These tests cover the detection logic
(injectable ``on_hang``) and the ``--auto_resume`` retry contract: a
supervisor re-running the identical command continues from the last
complete checkpoint when one exists, and starts fresh when none does.
"""

import json
import time

import numpy as np
import pytest

from ultrazoom_tpu.train.watchdog import HangWatchdog


def test_watchdog_fires_on_silence():
    fired = []
    wd = HangWatchdog(0.15, label="t", on_hang=lambda lbl, idle: fired.append((lbl, idle)))
    wd.start()
    time.sleep(0.6)
    wd.close()
    assert fired and fired[0][0] == "t" and fired[0][1] >= 0.15


def test_watchdog_stays_quiet_while_beating():
    fired = []
    wd = HangWatchdog(0.3, label="t", on_hang=lambda *a: fired.append(a))
    wd.start()
    for _ in range(6):
        time.sleep(0.1)
        wd.beat()
    wd.close()
    assert not fired


def test_watchdog_disabled():
    fired = []
    wd = HangWatchdog(0, on_hang=lambda *a: fired.append(a))
    assert not wd.enabled
    wd.start()
    time.sleep(0.2)
    wd.close()
    assert not fired
    wd2 = HangWatchdog(None)
    assert not wd2.enabled
    wd2.start()
    wd2.beat()
    wd2.close()


@pytest.fixture()
def dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("test", 2)):
        d = tmp_path / "ds" / split
        d.mkdir(parents=True)
        for i in range(n):
            base = rng.uniform(0, 1, (6, 6, 3))
            img = np.kron(base, np.ones((8, 8, 1)))[:40, :40]
            Image.fromarray((img * 255).astype(np.uint8)).save(d / f"{i}.png")
    return tmp_path / "ds"


TINY_MODEL_FLAGS = [
    "--num_primary_channels", "8", "--num_primary_layers", "2",
    "--num_secondary_channels", "12", "--num_secondary_layers", "2",
    "--num_tertiary_channels", "16", "--num_tertiary_layers", "2",
    "--num_quaternary_channels", "24", "--num_quaternary_layers", "2",
]


def _pretrain_args(dataset, ckpt, runs, epochs):
    return [
        "--train_images_path", str(dataset / "train"),
        "--test_images_path", str(dataset / "test"),
        "--target_resolution", "32",
        "--upscale_ratio", "2",
        "--batch_size", "4",
        "--gradient_accumulation_steps", "1",
        "--num_epochs", str(epochs),
        "--eval_interval", "10",
        "--checkpoint_interval", "1",
        "--checkpoint_path", str(ckpt),
        "--run_dir_path", str(runs),
        "--seed", "0",
        "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
        "--auto_resume",
        *TINY_MODEL_FLAGS,
    ]


@pytest.mark.slow
def test_auto_resume_retry_contract(dataset, tmp_path):
    """The exact command a supervisor retries: fresh start on an empty
    checkpoint dir, resume (not restart) once a checkpoint exists."""
    from ultrazoom_tpu.train.pretrain import main

    ckpt, runs = tmp_path / "ck", tmp_path / "runs"

    # No checkpoint: --auto_resume must start fresh (epoch 1..2).
    main(_pretrain_args(dataset, ckpt, runs, epochs=2))
    assert json.loads((ckpt / "meta.json").read_text())["epoch"] == 2

    # Checkpoint exists: the IDENTICAL command (more epochs) resumes at 3.
    main(_pretrain_args(dataset, ckpt, runs, epochs=3))
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 3

    # A completed stage re-run with the same num_epochs is a no-op
    # (start_epoch 4 > num_epochs 3) and must not clobber the checkpoint.
    main(_pretrain_args(dataset, ckpt, runs, epochs=3))
    assert json.loads((ckpt / "meta.json").read_text())["epoch"] == 3
