"""Convert an HF-style artifact directory back into a pretrain checkpoint.

The fine-tune CLI resumes from a *pretrain checkpoint directory*
(``--base_checkpoint_path``, see train/finetune.py), mirroring the
reference's ``fine-tune.py --base_checkpoint_path`` contract
(/root/reference/fine-tune.py:41-45).  Shipped models, however, live as
HF-style artifact dirs (safetensors + config.json) — the checkpoint dirs
they came from are training ephemera.  This tool bridges the two so any
published artifact can seed a new fine-tune / GAN stage:

    python -m ultrazoom_tpu.tools.artifact_to_checkpoint \
        --artifact artifacts/mewzoom-tpu-2x-ctrl --out checkpoints/2x_base

Params are loaded UNFOLDED (weight-norm factor form) so the checkpoint's
leaf structure matches what ``load_pretrain_params`` /
``load_ctrl_pretrain_params`` expect (train/steps.py:152-178).
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True, help="HF-style artifact dir")
    p.add_argument("--out", required=True, help="checkpoint dir to write")
    args = p.parse_args(argv)

    from ultrazoom_tpu.export import hf
    from ultrazoom_tpu.models import ctrl as _ctrl
    from ultrazoom_tpu.models import unet as _unet
    from ultrazoom_tpu.utils import save_state

    config, sd = hf.load_pretrained(args.artifact)
    is_ctrl = config.get("architecture") == "mewzoom-ctrl"
    if is_ctrl:
        # Ctrl params are scan-stacked; reuse the same flat->stacked
        # conversion from_pretrained uses (models/api.py:260-264).
        cfg = _ctrl.MewZoomCtrlConfig.from_dict(config)
        params = _ctrl.torch_flat_to_params(sd, cfg)
    else:
        cfg = _unet.MewZoomConfig.from_dict(config)
        params, _ = hf.torch_state_dict_to_tree(sd, fold=False)
    # Validate the tree against a fresh init of the same config: catches a
    # structure drift loudly instead of writing an unloadable checkpoint.
    like = (_ctrl if is_ctrl else _unet).init(jax.random.key(0), cfg)
    got = jax.tree.structure(params)
    want = jax.tree.structure(like)
    assert got == want, f"artifact tree != init tree:\n{got}\nvs\n{want}"

    # Conform leaf shapes to the init layout (torch scalars round-trip as
    # (1,) through safetensors; restore_params_only checks shapes exactly).
    def _conform(p, ref):
        import numpy as np

        p = np.asarray(p)
        assert p.size == np.asarray(ref).size, (p.shape, np.asarray(ref).shape)
        return p.reshape(np.asarray(ref).shape)

    params = jax.tree.map(_conform, params, like)

    save_state(
        args.out,
        params,
        {
            "epoch": 0,
            "architecture": "mewzoom-ctrl" if is_ctrl else "mewzoom-unet",
            "upscaler_args": cfg.to_dict(),
            "source_artifact": args.artifact,
        },
    )
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"wrote {args.out}: {n/1e6:.2f}M params ({'ctrl' if is_ctrl else 'unet'})")


if __name__ == "__main__":
    main()
