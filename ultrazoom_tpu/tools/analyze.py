"""Model introspection: learned ARM gate statistics.

Reference analog: analyze_model.ipynb — prints each AdaptiveResidualMix
module's learned global gate sigmoid(alpha) and the norm of its gate conv,
showing how strongly each skip connection mixes in the residual branch.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np


def _walk_arms(tree, path=""):
    """Yield (path, alpha, conv_weight) for every ARM param group."""
    if isinstance(tree, dict):
        if "alpha" in tree and "conv" in tree:
            yield path, tree["alpha"], tree["conv"]["weight"]
        else:
            for k, v in tree.items():
                yield from _walk_arms(v, f"{path}.{k}" if path else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk_arms(v, f"{path}.{i}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MewZoom-TPU model analysis")
    p.add_argument("--model_path", required=True, help="HF-style model dir")
    return p


def main(argv=None) -> None:
    from ultrazoom_tpu.models import from_pretrained

    args = build_parser().parse_args(argv)
    model = from_pretrained(args.model_path)
    print(f"{type(model).__name__}: {model.num_params:,} params\n")
    rows = list(_walk_arms(model.params))
    if not rows:
        print("No adaptive residual mix modules in this architecture.")
        return
    print(f"{'module':<48} {'sigmoid(alpha)':>14} {'|gate conv|':>12}")
    for path, alpha, w in rows:
        # safetensors round-trips 0-d scalars as shape (1,)
        a = float(np.asarray(alpha).reshape(-1)[0])
        gate = 1.0 / (1.0 + np.exp(-a))
        norm = float(np.linalg.norm(np.asarray(w)))
        print(f"{path:<48} {gate:>14.4f} {norm:>12.4f}")


if __name__ == "__main__":
    main()
