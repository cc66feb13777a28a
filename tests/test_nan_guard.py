"""NaN checkpoint-and-rewind guard tests (train/guard.py).

The reference has no training-failure machinery at all (its recovery story
is epoch-level --resume, pretrain.py:215-225); the guard is the TPU-native
hardening for the sporadic-NaN failure mode observed in round 2.  These
tests fault-inject a NaN and prove (1) the replay harness discriminates
deterministic bugs from transients and (2) the trainer itself rewinds and
completes.
"""

import json
import math

import numpy as np
import pytest

from ultrazoom_tpu.train.guard import NanRewindGuard, replay_epochs


def test_tripped_detects_any_nonfinite():
    assert not NanRewindGuard.tripped({"loss": 1.0, "grad_norm": 0.5})
    assert NanRewindGuard.tripped({"loss": float("nan")})
    assert NanRewindGuard.tripped({"loss": 1.0, "grad_norm": float("inf")})


def test_tripped_spike_threshold():
    """The round-3 finite blow-up shape: balanced loss pinned at #tasks while
    per-term metrics explode (grad_norm ~6e14, pixel_l2 ~8e8)."""
    spiked = {"loss": 4.0, "grad_norm": 6.3e14, "pixel_l2": 8.2e8}
    assert NanRewindGuard.tripped(spiked, spike_threshold=1e6)
    assert not NanRewindGuard.tripped(spiked)  # disabled by default
    healthy = {"loss": 4.0, "grad_norm": 10.4, "pixel_l2": 0.011}
    assert not NanRewindGuard.tripped(healthy, spike_threshold=1e6)


def test_replay_pinpoints_finite_spike():
    """A spike that recovers within the epoch is invisible to the epoch-end
    loss check; the per-step sweep with spike_threshold must pinpoint it."""
    poison = int(_indices(2)[1][0])

    def run_step(state, idx, epoch):
        spiked = poison in idx
        return state + 1, {"loss": 4.0, "grad_norm": 5e13 if spiked else 2.0}

    poisoned_step = next(i for i, idx in enumerate(_indices(2)) if poison in idx)
    diag = replay_epochs(
        run_step, _indices, state=0, from_epoch=2, to_epoch=2,
        spike_threshold=1e6,
    )
    assert diag["reproduced"] is True
    assert diag["epoch"] == 2 and diag["step"] == poisoned_step
    assert diag["metrics"]["grad_norm"] == 5e13
    # Without the threshold the finite spike replays "clean".
    diag2 = replay_epochs(run_step, _indices, state=0, from_epoch=2, to_epoch=2)
    assert diag2 == {"reproduced": False, "epoch": 2}


def _indices(epoch):
    # 3 fixed batches per epoch, deterministic in the epoch.
    rng = np.random.default_rng(epoch)
    return [rng.permutation(12)[:4].astype(np.int32) for _ in range(3)]


def test_replay_reproduces_deterministic_nan():
    """A NaN that is a pure function of (state, batch) must be reproduced
    and pinpointed to the exact step and batch indices."""

    poison = int(_indices(2)[1][0])  # a sample guaranteed to occur

    def run_step(state, idx, epoch):
        loss = float("nan") if poison in idx else 1.0
        return state + 1, {"loss": loss}

    poisoned_step = next(
        i for i, idx in enumerate(_indices(2)) if poison in idx
    )
    diag = replay_epochs(run_step, _indices, state=0, from_epoch=2, to_epoch=2)
    assert diag["reproduced"] is True
    assert diag["epoch"] == 2 and diag["step"] == poisoned_step
    assert poison in diag["batch_indices"]


def test_replay_does_not_reproduce_transient():
    """A one-shot corruption (already consumed in the live run) replays
    clean — the diagnosis substantiates the transient hypothesis."""
    calls = {"n": 0}

    def run_step(state, idx, epoch):
        calls["n"] += 1
        return state + 1, {"loss": 1.0}

    diag = replay_epochs(run_step, _indices, state=0, from_epoch=1, to_epoch=3)
    assert diag == {"reproduced": False, "epoch": 3}
    assert calls["n"] == 9  # 3 epochs x 3 batches actually re-executed


def test_replay_passes_epoch_to_run_step():
    seen = []

    def run_step(state, idx, epoch):
        seen.append(epoch)
        return state, {"loss": 1.0}

    replay_epochs(run_step, _indices, state=0, from_epoch=4, to_epoch=5)
    assert sorted(set(seen)) == [4, 5]


def test_rewind_exhaustion_raises(tmp_path):
    class _Ck:
        def wait(self):
            pass

    guard = NanRewindGuard(str(tmp_path / "nope"), max_rewinds=0)
    with pytest.raises(RuntimeError, match="rewinds exhausted"):
        guard.rewind(_Ck(), None)


@pytest.fixture(scope="module")
def ctrl_cache(tmp_path_factory):
    """Tiny cached ctrl dataset: 11 images so no virtual-device count >1
    divides the batch (batch 11 -> mesh None -> the device-resident path —
    the one the replay harness exercises — is active under the CPU tests)."""
    from PIL import Image

    from ultrazoom_tpu.data import (
        AugmentConfig,
        DegradationConfig,
        ImageFolder,
        build_sample_cache,
    )

    root = tmp_path_factory.mktemp("nan_ds")
    (root / "img").mkdir()
    rng = np.random.default_rng(0)
    for i in range(11):
        base = rng.uniform(0, 1, (5, 5, 3))
        img = np.kron(base, np.ones((5, 5, 1)))[:20, :20]
        Image.fromarray((img * 255).astype(np.uint8)).save(root / "img" / f"{i}.png")
    ds = ImageFolder(str(root / "img"), 16, 2, DegradationConfig(), AugmentConfig(16))
    build_sample_cache(ds, str(root / "cache"), num_variants=1, num_workers=2)
    return root


def test_pretrain_rewinds_after_injected_nan(ctrl_cache, tmp_path):
    """End-to-end: fault-inject a NaN at epoch 3 of a ctrl pretrain; the
    guard must replay (not reproduced => transient), rewind to the last
    checkpoint, and the run must still complete all epochs."""
    from ultrazoom_tpu.train.pretrain import main

    ckpt = tmp_path / "ck"
    main([
        "--train_images_path", str(ctrl_cache / "cache"),
        "--test_images_path", str(ctrl_cache / "img"),
        "--target_resolution", "16",
        "--upscale_ratio", "2",
        "--arch", "ctrl",
        "--num_channels", "8",
        "--num_encoder_layers", "2",
        "--batch_size", "11",
        "--gradient_accumulation_steps", "1",
        "--num_epochs", "4",
        "--eval_interval", "10",
        "--checkpoint_interval", "1",
        "--checkpoint_path", str(ckpt),
        "--run_dir_path", str(tmp_path / "runs"),
        "--seed", "0",
        "--loss_combiner", "pixel",
        "--compute_dtype", "float32",
        "--num_dataset_processes", "2",
        "--inject_nan_epoch", "3",
    ])

    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 4  # completed despite the poisoned epoch

    lines = (ckpt / "nan_diagnosis.jsonl").read_text().strip().splitlines()
    assert len(lines) == 1
    entry = json.loads(lines[0])
    assert entry["epoch"] == 3
    assert any(not math.isfinite(v) for v in entry["means"].values())
    # The injection is one-shot, so the deterministic replay runs clean.
    assert entry["replay"] == {"reproduced": False, "epoch": 3}


def test_handle_trip_heals_after_healthy_stretch(tmp_path):
    """max_rewinds bounds CONSECUTIVE failures: a trip more than heal_after
    epochs after the previous one resets the budget, so sporadic transients
    never exhaust a long soak; back-to-back trips still fail loudly."""
    import jax.numpy as jnp

    from ultrazoom_tpu.utils import AsyncCheckpointer

    ck = AsyncCheckpointer()
    state = {"w": jnp.zeros(3)}
    ck.save(str(tmp_path), state, {"epoch": 5})
    ck.wait()
    bad = {"loss": float("nan")}

    guard = NanRewindGuard(str(tmp_path), max_rewinds=1, heal_after=3)
    s, e = guard.handle_trip(ck, state, 6, bad)
    assert e == 6 and guard.rewinds == 1
    # 20 - 6 > heal_after: the budget resets before being spent again.
    s, e = guard.handle_trip(ck, state, 20, bad)
    assert e == 6 and guard.rewinds == 1

    # Consecutive trips (within heal_after) still exhaust.
    guard2 = NanRewindGuard(str(tmp_path), max_rewinds=1, heal_after=3)
    guard2.handle_trip(ck, state, 6, bad)
    with pytest.raises(RuntimeError, match="rewinds exhausted"):
        guard2.handle_trip(ck, state, 7, bad)
