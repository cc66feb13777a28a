"""Offline sample cache: bit-exactness vs the live pipeline + trainer integration.

The cache's contract is strong: variant block v of the cache is
bit-identical to live epoch v under BatchLoader's rng derivation
(SeedSequence([seed, epoch, idx])), because every pipeline stage ends in
uint8 (JPEG decode last, augment rounds back to uint8).
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast default subset


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(7)
    for i in range(3):
        base = rng.uniform(0, 1, (5, 5, 3))
        img = np.kron(base, np.ones((8, 8, 1)))[:36, :36]
        Image.fromarray((img * 255).astype(np.uint8)).save(root / f"{i}.png")
    return root


@pytest.fixture(scope="module")
def live_ds(image_dir):
    from ultrazoom_tpu.data import AugmentConfig, DegradationConfig, ImageFolder

    return ImageFolder(
        str(image_dir), target_resolution=32, upscale_ratio=2,
        degradation=DegradationConfig(),
        augmentation=AugmentConfig(32),
    )


def test_cache_is_bit_identical_to_live_pipeline(live_ds, tmp_path):
    from ultrazoom_tpu.data import CachedImageFolder, build_sample_cache

    seed, variants = 123, 2
    meta = build_sample_cache(
        live_ds, tmp_path / "c", num_variants=variants, seed=seed, num_workers=2
    )
    assert meta["n_samples"] == len(live_ds) * variants

    cached_f32 = CachedImageFolder(tmp_path / "c", dtype="float32")
    cached_u8 = CachedImageFolder(tmp_path / "c")  # default: uint8 transport
    assert len(cached_f32) == meta["n_samples"]
    for v in range(variants):
        for i in range(len(live_ds)):
            rng = np.random.default_rng(np.random.SeedSequence([seed, v, i]))
            live = live_ds[(i, rng)]
            got = cached_f32[(v * len(live_ds) + i, None)]
            for k in ("x", "y", "y_deg"):
                np.testing.assert_array_equal(
                    got[k], live[k], err_msg=f"variant {v} image {i} key {k}"
                )
            # uint8 transport is the same data exactly: f32(u8)/255 == live.
            got8 = cached_u8[(v * len(live_ds) + i, None)]
            assert got8["x"].dtype == np.uint8 and got8["y"].dtype == np.uint8
            np.testing.assert_array_equal(
                got8["x"].astype(np.float32) / 255.0, live["x"]
            )
            np.testing.assert_array_equal(
                got8["y"].astype(np.float32) / 255.0, live["y"]
            )


def test_cache_detection_and_loader(live_ds, tmp_path):
    from ultrazoom_tpu.data import (
        BatchLoader,
        CachedImageFolder,
        build_sample_cache,
        is_sample_cache,
    )

    assert not is_sample_cache(tmp_path)
    build_sample_cache(live_ds, tmp_path / "c", num_variants=2, seed=0)
    assert is_sample_cache(tmp_path / "c")

    loader = BatchLoader(CachedImageFolder(tmp_path / "c"), batch_size=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3  # 6 samples / 2
    b = batches[0]
    assert b["x"].shape == (2, 16, 16, 3) and b["x"].dtype == np.uint8
    assert b["y"].shape == (2, 32, 32, 3) and b["y"].dtype == np.uint8
    assert b["y_deg"].shape == (2, 3) and b["y_deg"].dtype == np.float32


def test_uint8_batch_equals_float_batch():
    """Train steps accept uint8 batches (device-side /255) with results
    bit-identical to pre-normalised f32 batches."""
    import jax
    import jax.numpy as jnp

    from ultrazoom_tpu.losses import init_vgg19_features
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.train import (
        TrainState, make_ctrl_pretrain_step, make_optimizer,
    )

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    params = ctrl.init(jax.random.key(0), cfg)
    opt = make_optimizer(1e-3, 1.0)
    step = jax.jit(make_ctrl_pretrain_step(cfg, opt, init_vgg19_features(seed=0)))

    rng = np.random.default_rng(3)
    x8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    y8 = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    deg = rng.uniform(0, 1, (2, 3)).astype(np.float32)
    b8 = {"x": x8, "y": y8, "y_deg": deg}
    bf = {
        "x": x8.astype(np.float32) / 255.0,
        "y": y8.astype(np.float32) / 255.0,
        "y_deg": deg,
    }

    s0 = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    s_a, m_a = step(s0, b8)
    s_b, m_b = step(s0, bf)
    np.testing.assert_array_equal(
        np.asarray(m_a["loss"]), np.asarray(m_b["loss"])
    )
    # The /255 normalisation itself is value-exact (loss above is
    # bit-identical), but XLA may fuse it into downstream convs and
    # reassociate f32 ops — gradients agree to float noise, not bits.
    for la, lb in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-6
        )


def test_device_resident_gather_step(live_ds, tmp_path):
    """Device-resident data: gather-step == loader-step on the same batch,
    and the epoch permutation matches BatchLoader's."""
    import jax
    import jax.numpy as jnp

    from ultrazoom_tpu.data import BatchLoader, CachedImageFolder, build_sample_cache
    from ultrazoom_tpu.losses import init_vgg19_features
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.train import (
        TrainState, make_ctrl_pretrain_step, make_optimizer,
    )
    from ultrazoom_tpu.train.device_data import (
        cache_nbytes,
        epoch_batch_indices,
        make_gather_step,
        upload_cache,
    )

    build_sample_cache(live_ds, tmp_path / "c", num_variants=2, seed=0)
    ds = CachedImageFolder(tmp_path / "c")
    assert cache_nbytes(ds) == ds._x.nbytes + ds._y.nbytes + ds._deg.nbytes

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    params = ctrl.init(jax.random.key(0), cfg)
    opt = make_optimizer(1e-3, 1.0)
    step_fn = make_ctrl_pretrain_step(cfg, opt, init_vgg19_features(seed=0))
    s0 = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    data = upload_cache(ds)
    gstep = make_gather_step(step_fn)

    # Same epoch-0 order as BatchLoader with the same seed.
    loader = BatchLoader(ds, batch_size=2, seed=11, num_workers=1)
    loader_batches = list(loader)
    idx_batches = list(epoch_batch_indices(len(ds), 2, 11, 0))
    assert len(loader_batches) == len(idx_batches)
    np.testing.assert_array_equal(
        loader_batches[0]["x"], np.asarray(ds._x)[idx_batches[0]]
    )

    # One gather step == one step on the equivalent host batch.  (Host
    # step first: gstep donates the state, invalidating shared param
    # buffers.)
    s0b = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    _, m_h = jax.jit(step_fn)(s0b, loader_batches[0])
    _, m_g = gstep(s0, data, jnp.asarray(idx_batches[0]))
    np.testing.assert_allclose(
        float(m_g["loss"]), float(m_h["loss"]), rtol=1e-6
    )


def test_pretrain_cli_over_cache(image_dir, tmp_path):
    """The pretrain CLI auto-detects a cache dir passed as the images path."""
    from ultrazoom_tpu.tools.cache_dataset import main as cache_main
    from ultrazoom_tpu.train.pretrain import main as pt_main

    cache_main([
        "--images_path", str(image_dir),
        "--out", str(tmp_path / "trainc"),
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--num_variants", "3", "--num_dataset_processes", "2",
    ])
    cache_main([
        "--images_path", str(image_dir),
        "--out", str(tmp_path / "testc"),
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--eval", "--num_dataset_processes", "2",
    ])

    ckpt = tmp_path / "ck"
    pt_main([
        "--train_images_path", str(tmp_path / "trainc"),
        "--test_images_path", str(tmp_path / "testc"),
        "--arch", "ctrl", "--num_channels", "8", "--num_encoder_layers", "2",
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--num_epochs", "2", "--eval_interval", "2",
        "--checkpoint_interval", "2",
        "--checkpoint_path", str(ckpt),
        "--run_dir_path", str(tmp_path / "runs"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ])
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 2


def test_device_resident_mesh_modes(live_ds, tmp_path):
    """Mesh-aware device-resident data (VERDICT r2 #7): the replicated mode
    reproduces the single-device gather step exactly (same visitation
    order, same loss); the sample-sharded mode (shard_map local gather over
    stratified indices) matches a host-side step on the same batch."""
    import jax
    import jax.numpy as jnp

    from ultrazoom_tpu.data import CachedImageFolder, build_sample_cache
    from ultrazoom_tpu.losses import init_vgg19_features
    from ultrazoom_tpu.models import ctrl
    from ultrazoom_tpu.parallel import make_mesh
    from ultrazoom_tpu.train import (
        TrainState, make_ctrl_pretrain_step, make_optimizer,
    )
    from ultrazoom_tpu.train.device_data import (
        epoch_batch_indices,
        make_gather_step,
        plan_device_data,
        upload_cache,
    )

    build_sample_cache(live_ds, tmp_path / "c", num_variants=4, seed=0)
    ds = CachedImageFolder(tmp_path / "c")  # 12 samples
    mesh = make_mesh(jax.devices()[:4])

    cfg = ctrl.MewZoomCtrlConfig(upscale_ratio=2, num_channels=8, num_layers=2)
    params = ctrl.init(jax.random.key(0), cfg)
    opt = make_optimizer(1e-3, 1.0)
    step_fn = make_ctrl_pretrain_step(cfg, opt, init_vgg19_features(seed=0))

    def fresh():
        # Deep-copy: the gather steps donate their state, which would
        # invalidate the shared param buffers for the next run.
        p = jax.tree.map(jnp.copy, params)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    # Placement planning: tiny cache -> replicated; per-device budget too
    # small but aggregate OK -> sharded; nothing fits -> None.
    nb = ds._x.nbytes + ds._y.nbytes + ds._deg.nbytes
    assert plan_device_data(ds, mesh, 4) == "replicated"
    assert plan_device_data(ds, mesh, 4, budget=nb // 3) == "sharded"
    assert plan_device_data(ds, None, 4, budget=nb // 3) is None
    assert plan_device_data(ds, mesh, 4, budget=nb // 5) is None
    assert plan_device_data(ds, mesh, 6, budget=nb // 3) is None  # 6 % 4 != 0

    # Single-device reference over one epoch (batch 4 -> 3 steps).
    data1 = upload_cache(ds)
    g1 = make_gather_step(step_fn)
    s1 = fresh()
    ref_losses = []
    for idx in epoch_batch_indices(len(ds), 4, seed=3, epoch=0):
        s1, m = g1(s1, data1, jnp.asarray(idx))
        ref_losses.append(float(m["loss"]))

    # Replicated on the mesh: identical indices, loss equal to float noise
    # (sharded reductions reassociate float sums).
    data_r = upload_cache(ds, mesh, "replicated")
    gr = make_gather_step(step_fn, mesh=mesh, mode="replicated", n_samples=len(ds))
    sr = fresh()
    for i, idx in enumerate(epoch_batch_indices(len(ds), 4, seed=3, epoch=0)):
        sr, m = gr(sr, data_r, idx)
        np.testing.assert_allclose(float(m["loss"]), ref_losses[i], rtol=1e-5)

    # Sharded: stratified indices stay within each shard's range, and the
    # mesh step matches a single-device step on the same gathered batch.
    idx_s = list(epoch_batch_indices(len(ds), 4, seed=3, epoch=0, n_shards=4))
    per_shard = len(ds) // 4
    seen = np.sort(np.concatenate(idx_s))
    np.testing.assert_array_equal(seen, np.arange(len(ds)))  # full epoch
    for idx in idx_s:
        for d in range(4):
            seg = idx[d : d + 1]  # batch 4 / 4 shards = 1 row per shard
            assert (seg >= d * per_shard).all() and (seg < (d + 1) * per_shard).all()

    data_s = upload_cache(ds, mesh, "sharded")
    gs = make_gather_step(step_fn, mesh=mesh, mode="sharded", n_samples=len(ds))
    ss = fresh()
    ss, m_s = gs(ss, data_s, idx_s[0])
    host_batch = {k: np.asarray(v)[idx_s[0]] for k, v in
                  {"x": ds._x, "y": ds._y, "y_deg": ds._deg}.items()}
    _, m_h = jax.jit(step_fn)(fresh(), host_batch)
    np.testing.assert_allclose(float(m_s["loss"]), float(m_h["loss"]), rtol=1e-5)


def test_cache_max_samples_subset(live_ds, tmp_path):
    """max_samples head-slices the variant-major cache: every source image
    is kept, whole degradation variants are dropped, content bit-equal to
    the unsliced head."""
    from ultrazoom_tpu.data import CachedImageFolder, build_sample_cache

    build_sample_cache(live_ds, tmp_path / "c", num_variants=4, seed=0)
    full = CachedImageFolder(tmp_path / "c")       # 3 images x 4 = 12
    sub = CachedImageFolder(tmp_path / "c", max_samples=6)
    assert len(full) == 12 and len(sub) == 6
    for i in range(6):
        np.testing.assert_array_equal(sub[i]["x"], full[i]["x"])
        np.testing.assert_array_equal(sub[i]["y"], full[i]["y"])
    # A cap >= the cache is a no-op.
    assert len(CachedImageFolder(tmp_path / "c", max_samples=99)) == 12
    # A cap below the image count drops source images -> warns.
    with pytest.warns(UserWarning, match="source images"):
        CachedImageFolder(tmp_path / "c", max_samples=2)


def test_pretrain_cli_early_stop(image_dir, tmp_path):
    """--early_stop_patience ends the run at the eval-PSNR plateau and
    still writes a final checkpoint off the checkpoint_interval grid;
    --max_train_samples caps the cache the trainer sees; --lr_schedule
    cosine builds and trains under a decaying schedule."""
    from ultrazoom_tpu.tools.cache_dataset import main as cache_main
    from ultrazoom_tpu.train.pretrain import main as pt_main

    cache_main([
        "--images_path", str(image_dir),
        "--out", str(tmp_path / "trainc"),
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--num_variants", "3", "--num_dataset_processes", "2",
    ])
    cache_main([
        "--images_path", str(image_dir),
        "--out", str(tmp_path / "testc"),
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--eval", "--num_dataset_processes", "2",
    ])

    ckpt = tmp_path / "ck"
    pt_main([
        "--train_images_path", str(tmp_path / "trainc"),
        "--test_images_path", str(tmp_path / "testc"),
        "--arch", "ctrl", "--num_channels", "8", "--num_encoder_layers", "2",
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--max_train_samples", "6",
        "--num_epochs", "8", "--eval_interval", "1",
        # An impossible min_delta makes every eval after the first stale,
        # so patience 1 stops the run at epoch 2 (of 8).  The anneal is
        # already complete by then (--cosine_epochs 2), so the stop is
        # not deferred.
        "--early_stop_patience", "1", "--early_stop_min_delta", "1e9",
        "--lr_schedule", "cosine", "--cosine_epochs", "2",
        "--checkpoint_interval", "5",
        "--checkpoint_path", str(ckpt),
        "--run_dir_path", str(tmp_path / "runs"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ])
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 2  # early-stopped + off-grid final save

    # Anneal-aware deferral: with a 4-epoch cosine horizon the plateau at
    # epoch 2 must NOT stop the run mid-anneal; stopping becomes legal at
    # epoch ceil(0.9 * 4) = 4 (of 8), where the same stale counter fires.
    ckpt2 = tmp_path / "ck2"
    pt_main([
        "--train_images_path", str(tmp_path / "trainc"),
        "--test_images_path", str(tmp_path / "testc"),
        "--arch", "ctrl", "--num_channels", "8", "--num_encoder_layers", "2",
        "--target_resolution", "32", "--upscale_ratio", "2",
        "--batch_size", "4", "--gradient_accumulation_steps", "1",
        "--max_train_samples", "6",
        "--num_epochs", "8", "--eval_interval", "1",
        "--early_stop_patience", "1", "--early_stop_min_delta", "1e9",
        "--lr_schedule", "cosine", "--cosine_epochs", "4",
        "--checkpoint_interval", "5",
        "--checkpoint_path", str(ckpt2),
        "--run_dir_path", str(tmp_path / "runs2"),
        "--seed", "0", "--num_dataset_processes", "2",
        "--compute_dtype", "float32",
    ])
    meta2 = json.loads((ckpt2 / "meta.json").read_text())
    assert meta2["epoch"] == 4  # deferred past the anneal, then stopped
