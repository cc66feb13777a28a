"""ONNX deployment round-trip: HF export dir -> reference torch model ->
``torch.onnx.export`` -> ONNX Runtime parity gate.

The reference's entire deployment story is ONNX + ONNX Runtime
(export_model.ipynb cells 9/11, README.md:131-222).  Our native deployment
format is StableHLO (tools/export.py), but a reference user's target is
ORT — this script closes the gap by round-tripping through the torch
reference implementation:

  1. load OUR HF-style export dir (config.json + torch-layout
     model.safetensors, written by ``model.save_pretrained`` /
     tools/export.py) into the reference ``MewZoom`` *strict*,
  2. wrap it in the reference's ``ONNXModel`` (so the [0,1] clamp is in the
     ONNX graph, reference model.py:195-209),
  3. ``torch.onnx.export`` with dynamic batch/H/W exactly as the
     reference's export notebook (dynamo path, Dim.DYNAMIC),
  4. numeric parity gate vs torch: ``assert_allclose(rtol=1e-2, atol=1e-3)``
     through an ONNX Runtime CPU session (cell-11's tolerance).

Requires: torch (always), the reference ``ultrazoom`` package or a source
tree (``--reference_src``), and onnx/onnxscript for step 3 + onnxruntime
for step 4.  Steps degrade with clear messages when a dependency is absent
(this air-gapped build image has torch but no onnx; the script is the
recorded recipe, tests cover steps 1-2 and gate 3-4 on availability).

Usage::

    python -m ultrazoom_tpu.tools.export_onnx \
        --model_path exports/my-model --out exports/my-model/model.onnx \
        --reference_src /path/to/UltraZoom
"""

from __future__ import annotations

import argparse
import json
import pathlib

__all__ = ["load_reference_ultrazoom", "build_reference_model", "export_onnx"]


def load_reference_ultrazoom(reference_src: str | None = None):
    """Import the reference model module: the installed ``ultrazoom``
    package if present, else a source tree given by ``--reference_src``.

    When loading from source, the snapshot's construction bug is patched in
    memory (``qa_num_features`` -> ``num_deg_features``; the 0.3.0 snapshot
    raises NameError otherwise — SURVEY.md section 0.1).  Nothing is copied
    to disk.
    """
    if reference_src is None:
        try:
            from ultrazoom import model as ref_model  # the real pip package

            return ref_model
        except ImportError as e:
            raise RuntimeError(
                "The reference `ultrazoom` package is not installed; pass "
                "--reference_src pointing at an UltraZoom source tree."
            ) from e

    import sys
    import types

    src_path = pathlib.Path(reference_src)
    model_py = src_path / "src" / "ultrazoom" / "model.py"
    if not model_py.exists():
        model_py = src_path / "model.py"
    if not model_py.exists():
        raise FileNotFoundError(f"no ultrazoom model.py under {reference_src}")

    src = model_py.read_text()
    src = src.replace("qa_num_features > 0", "num_deg_features > 0")
    try:
        import huggingface_hub  # noqa: F401
    except ImportError:
        stub = types.ModuleType("huggingface_hub")
        stub.PyTorchModelHubMixin = type("PyTorchModelHubMixin", (), {})
        sys.modules.setdefault("huggingface_hub", stub)
    mod = types.ModuleType("reference_ultrazoom_model")
    mod.__file__ = str(model_py)
    exec(compile(src, str(model_py), "exec"), mod.__dict__)
    return mod


def build_reference_model(model_path, reference_src: str | None = None):
    """Steps 1-2: HF dir -> reference torch MewZoom (strict load), eval'd.

    Returns (torch_model, config_args).
    """
    from safetensors.torch import load_file

    model_path = pathlib.Path(model_path)
    config = json.loads((model_path / "config.json").read_text())
    arch = config.pop("architecture", "mewzoom-unet")
    if arch != "mewzoom-unet":
        raise RuntimeError(
            f"ONNX round-trip targets the 0.3.0 U-Net (the architecture the "
            f"reference snapshot can construct); got {arch!r}.  Ctrl models "
            f"deploy via StableHLO (tools/export.py) — the 0.2.x torch class "
            f"is absent from the reference snapshot."
        )

    ref = load_reference_ultrazoom(reference_src)
    model = ref.MewZoom(**config)
    sd = load_file(str(model_path / "model.safetensors"))
    model.load_state_dict(sd, strict=True)
    model.eval()
    return model, config


def export_onnx(
    model_path,
    out_path,
    reference_src: str | None = None,
    image_size: int = 128,
    check: bool = True,
) -> str:
    """Full round-trip; returns the written ONNX path.

    Mirrors the reference export notebook: ONNXModel wrapper, dynamic
    batch/H/W via ``Dim.DYNAMIC`` (channel static), dynamo exporter, then
    the rtol=1e-2/atol=1e-3 ORT parity gate.
    """
    import torch

    model, _ = build_reference_model(model_path, reference_src)
    ref = load_reference_ultrazoom(reference_src)
    onnx_model = ref.ONNXModel(model)

    try:
        from torch.onnx import export as torch_onnx_export
        from torch.export.dynamic_shapes import Dim

        x = torch.randn(1, 3, image_size, image_size)
        # The snapshot's ONNXModel takes only x (cell-9's (x, c) is 0.2.x
        # drift; the class signature is the source of truth).
        dynamic_shapes = {
            "x": {0: Dim.DYNAMIC, 1: Dim.STATIC, 2: Dim.DYNAMIC, 3: Dim.DYNAMIC},
        }
        onnx_graph = torch_onnx_export(
            onnx_model,
            (x,),
            dynamic_shapes=dynamic_shapes,
            dynamo=True,
            input_names=["x"],
            output_names=["output"],
        )
        onnx_graph.save(str(out_path))
    except ImportError as e:
        raise RuntimeError(
            "torch.onnx dynamo export requires the `onnx` + `onnxscript` "
            "packages (pip install onnx onnxscript).  The HF dir already "
            f"loads into the reference torch model strict; only the ONNX "
            f"serialization step is blocked ({e})."
        ) from e

    if check:
        try:
            import onnxruntime
        except ImportError:
            print(
                "onnxruntime not installed — skipping the parity gate "
                "(pip install onnxruntime to enable)."
            )
            return str(out_path)
        from numpy.testing import assert_allclose

        with torch.inference_mode():
            want = model.upscale(x).numpy()
        session = onnxruntime.InferenceSession(
            str(out_path), providers=["CPUExecutionProvider"]
        )
        got = session.run(None, {"x": x.numpy()})[0]
        assert_allclose(want, got, rtol=1e-2, atol=1e-3)
        print("ONNX parity gate passed (rtol=1e-2, atol=1e-3).")
    return str(out_path)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model_path", required=True, help="HF-style export dir")
    p.add_argument("--out", required=True, help="output .onnx path")
    p.add_argument(
        "--reference_src",
        default=None,
        help="UltraZoom source tree (if the ultrazoom package isn't installed)",
    )
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--skip_check", action="store_true")
    args = p.parse_args(argv)
    out = export_onnx(
        args.model_path,
        args.out,
        reference_src=args.reference_src,
        image_size=args.image_size,
        check=not args.skip_check,
    )
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
