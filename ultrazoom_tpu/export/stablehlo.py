"""Deployment export: StableHLO serialization of the compiled upscaler.

The reference's deployment story is ONNX + ONNX Runtime
(export_model.ipynb, README.md:131-222).  The XLA-native equivalent is
**StableHLO**: ``jax.export`` serializes the jitted upscale function (with
the clamp inside the graph, mirroring the reference's ``ONNXModel`` wrapper
around ``upscale``) into a portable artifact any PJRT runtime (TPU, GPU,
CPU) can load and run without Python.

Numeric parity against the eager model is asserted at export time with the
same tolerance the reference uses for its ONNX parity gate
(rtol 1e-2 / atol 1e-3, export_model.ipynb cell-11) — our f32 path passes
at far tighter tolerance; bf16 uses the documented gate.
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np

__all__ = ["export_stablehlo", "load_stablehlo", "parity_check"]


def export_stablehlo(
    path: str | pathlib.Path,
    fn,
    example_args: tuple,
) -> "jax.export.Exported":
    """Serialize ``jit(fn)`` at the example shapes to ``path`` (bytes)."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(data)
    return exported


def load_stablehlo(path: str | pathlib.Path):
    """Deserialize an exported artifact; returns an object whose ``.call``
    runs the compiled graph."""
    from jax import export as jexport

    return jexport.deserialize(pathlib.Path(path).read_bytes())


def parity_check(fn, loaded, example_args, rtol=1e-2, atol=1e-3) -> None:
    """Reference-tolerance numeric parity between eager fn and the
    round-tripped artifact."""
    want = jax.jit(fn)(*example_args)
    got = loaded.call(*example_args)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=rtol, atol=atol,
        ),
        want,
        got,
    )
