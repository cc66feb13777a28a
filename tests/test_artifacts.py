"""Every shipped artifact in artifacts/ must load and upscale.

The reference's README instructs users to ``from_pretrained`` its published
checkpoints (README.md:35-42); the analog contract here is that every
HF-style directory we ship loads through the top-level arch-dispatching
``from_pretrained`` and produces a finite, correctly-shaped upscale.
Parametrized over whatever is present so newly shipped artifacts (e.g. the
bf16 56M flagship) are covered the moment they land.
"""

import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast default subset

ARTIFACTS = sorted(
    d for d in pathlib.Path("artifacts").glob("*") if (d / "config.json").exists()
) if pathlib.Path("artifacts").is_dir() else []


@pytest.mark.parametrize("path", ARTIFACTS, ids=lambda p: p.name)
def test_shipped_artifact_loads_and_upscales(path):
    from ultrazoom_tpu.models.api import from_pretrained

    model = from_pretrained(str(path))
    r = model.cfg.upscale_ratio
    x = np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    y = np.asarray(model.upscale(x))
    assert y.shape == (16 * r, 16 * r, 3)
    assert np.isfinite(y).all()
    assert 0.0 <= y.min() and y.max() <= 1.0


def test_artifacts_present():
    assert ARTIFACTS, "artifacts/ should ship at least one trained model"
