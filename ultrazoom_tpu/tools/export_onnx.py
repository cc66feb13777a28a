"""ONNX deployment round-trip: HF export dir -> reference torch model ->
``torch.onnx.export`` -> ONNX Runtime parity gate.

The reference's entire deployment story is ONNX + ONNX Runtime
(export_model.ipynb cells 9/11, README.md:131-222).  Our native deployment
format is StableHLO (tools/export.py), but a reference user's target is
ORT — this script closes the gap by round-tripping through the torch
reference implementation:

  1. load OUR HF-style export dir (config.json + torch-layout
     model.safetensors, written by ``model.save_pretrained`` /
     tools/export.py) into a torch model *strict* — the reference
     ``MewZoom`` for U-Net exports, our torch Ctrl reconstruction
     (convert/ctrl_torch.py) for the 0.2.x family whose source the
     snapshot lacks,
  2. wrap it in the matching export wrapper so the [0,1] clamp is in the
     ONNX graph (reference model.py:195-209; Ctrl keeps the two-input
     ``(x, c)`` interface of cell-9 / README.md:181-185),
  3. ``torch.onnx.export`` with dynamic batch/H/W.  The dynamo path
     (reference notebook) runs when onnx+onnxscript are installed;
     otherwise the TorchScript exporter is used — its ModelProto
     serialization is C++ and needs NO python onnx package, so this step
     produces a real .onnx artifact even in this air-gapped image,
  4. structural gate via our pure-python proto reader
     (convert/onnx_reader.py): opset/input/initializer checks — always;
     numeric parity gate ``assert_allclose(rtol=1e-2, atol=1e-3)``
     (cell-11's tolerance) through an ONNX Runtime CPU session when
     onnxruntime is installed, else by EXECUTING the serialized graph
     with the pure-numpy evaluator (convert/onnx_eval.py) — the artifact
     is numerically validated either way.

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
    """Steps 1-2: HF dir -> torch model (strict load), eval'd.

    U-Net exports load into the *reference* ``MewZoom``; Ctrl exports load
    into our torch reconstruction of the 0.2.x graph (the snapshot does not
    contain that generation's source — convert/ctrl_torch.py).

    Returns (torch_model, config_args).
    """
    from safetensors.torch import load_file

    model_path = pathlib.Path(model_path)
    config = json.loads((model_path / "config.json").read_text())
    arch = config.pop("architecture", "mewzoom-unet")
    if arch == "mewzoom-ctrl":
        from ultrazoom_tpu.convert.ctrl_torch import load_torch_ctrl_pretrained

        return load_torch_ctrl_pretrained(model_path)
    if arch != "mewzoom-unet":
        raise RuntimeError(f"unknown architecture {arch!r}")

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

    model, config = build_reference_model(model_path, reference_src)
    is_ctrl = hasattr(model, "controllable")
    if is_ctrl:
        from ultrazoom_tpu.convert.ctrl_torch import OnnxCtrlModel

        onnx_model = OnnxCtrlModel(model)
        two_inputs = model.controllable
    else:
        ref = load_reference_ultrazoom(reference_src)
        # The snapshot's ONNXModel takes only x (cell-9's (x, c) is 0.2.x
        # drift; the class signature is the source of truth).
        onnx_model = ref.ONNXModel(model)
        two_inputs = False

    x = torch.randn(1, 3, image_size, image_size)
    c = torch.tensor([[0.5, 0.2, 0.3]])
    args = (x, c) if two_inputs else (x,)
    input_names = ["x", "c"] if two_inputs else ["x"]

    try:
        # Preferred: the dynamo exporter the reference notebook uses
        # (needs onnx + onnxscript).
        from torch.export.dynamic_shapes import Dim
        from torch.onnx import export as torch_onnx_export

        dynamic_shapes: dict = {
            "x": {0: Dim.DYNAMIC, 1: Dim.STATIC, 2: Dim.DYNAMIC, 3: Dim.DYNAMIC},
        }
        if two_inputs:
            dynamic_shapes["c"] = {0: Dim.DYNAMIC, 1: Dim.STATIC}
        onnx_graph = torch_onnx_export(
            onnx_model,
            args,
            dynamic_shapes=dynamic_shapes,
            dynamo=True,
            input_names=input_names,
            output_names=["output"],
        )
        onnx_graph.save(str(out_path))
    except ImportError:
        # Fallback: the TorchScript exporter serializes the ModelProto in
        # C++, so it works WITHOUT the python `onnx` package — the only
        # python-side onnx use is _add_onnxscript_fn, a no-op unless the
        # graph contains custom onnxscript functions (ours never does).
        # The module path is torch-version-specific (2.13 here); fail with
        # a pointer rather than a bare AttributeError on other versions.
        try:
            from torch.onnx._internal.torchscript_exporter import (
                onnx_proto_utils,
            )
        except ImportError as e:  # pragma: no cover - other torch versions
            raise RuntimeError(
                "No python `onnx` package and this torch version does not "
                "expose torch.onnx._internal.torchscript_exporter (the "
                "no-onnx export shim targets torch 2.13). Install `onnx` "
                "or adjust the shim for this torch."
            ) from e

        orig = onnx_proto_utils._add_onnxscript_fn
        onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, _ops: model_bytes
        try:
            dynamic_axes = {"x": {0: "batch", 2: "height", 3: "width"}}
            if two_inputs:
                dynamic_axes["c"] = {0: "batch"}
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                torch.onnx.export(
                    onnx_model,
                    args,
                    str(out_path),
                    dynamo=False,
                    opset_version=17,
                    input_names=input_names,
                    output_names=["output"],
                    dynamic_axes=dynamic_axes,
                )
        finally:
            onnx_proto_utils._add_onnxscript_fn = orig

    # Structural gate (no onnx package needed): parse the emitted
    # ModelProto with our pure-python wire reader and check the artifact
    # carries the full model.
    from ultrazoom_tpu.convert.onnx_reader import read_onnx

    summary = read_onnx(out_path)
    assert summary.opset.get("", 0) >= 10, summary.opset  # DepthToSpace CRD
    got_inputs = [v["name"] for v in summary.inputs]
    assert got_inputs == input_names, got_inputs
    n_params = sum(p.numel() for p in model.parameters())
    # Weights live in graph initializers plus whatever the exporter
    # constant-folded into Constant nodes; folding may legitimately shrink
    # the count a little (fused scalar gates), never by much.
    assert summary.weight_elements >= 0.95 * n_params, (
        summary.weight_elements, n_params,
    )
    print(
        f"ONNX structural gate passed: opset {summary.opset.get('', '?')}, "
        f"inputs {got_inputs}, {len(summary.ops)} nodes, "
        f"{summary.initializer_nbytes / 1e6:.1f} MB weights."
    )

    if check:
        from numpy.testing import assert_allclose

        with torch.inference_mode():
            want = model.upscale(*args).numpy()
        feeds = {"x": x.numpy()}
        if two_inputs:
            feeds["c"] = c.numpy()
        try:
            import onnxruntime
        except ImportError:
            # No ORT in this image: EXECUTE the serialized graph with the
            # pure-numpy evaluator (convert/onnx_eval.py) under the same
            # cell-11 tolerance, so the artifact is still numerically
            # validated, not just structurally parsed.
            from ultrazoom_tpu.convert.onnx_eval import load_onnx_graph, run_onnx

            got = run_onnx(load_onnx_graph(out_path), feeds)[0]
            assert_allclose(want, got, rtol=1e-2, atol=1e-3)
            print(
                "ONNX parity gate passed via the numpy evaluator "
                "(rtol=1e-2, atol=1e-3; onnxruntime not installed)."
            )
            return str(out_path)
        session = onnxruntime.InferenceSession(
            str(out_path), providers=["CPUExecutionProvider"]
        )
        got = session.run(None, feeds)[0]
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
