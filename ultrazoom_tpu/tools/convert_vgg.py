"""Convert torchvision VGG19 weights to the safetensors file the perceptual
loss consumes (losses/vgg.py, ``UZ_VGG19_WEIGHTS``).

This environment has no network and no torchvision, so the weights cannot
be baked in; on a connected machine run either::

    # from torchvision (downloads ImageNet weights):
    python -m ultrazoom_tpu.tools.convert_vgg --out vgg19.safetensors

    # or from a downloaded checkpoint file (torchvision's vgg19 .pth):
    python -m ultrazoom_tpu.tools.convert_vgg --pth vgg19-dcbb9e9d.pth --out vgg19.safetensors

then point the trainer at it: ``export UZ_VGG19_WEIGHTS=vgg19.safetensors``.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pth", default=None, help="torchvision vgg19 state-dict .pth")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    if args.pth:
        import torch

        sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    else:
        from torchvision.models import VGG19_Weights, vgg19  # needs torchvision

        sd = vgg19(weights=VGG19_Weights.DEFAULT).state_dict()

    from safetensors.numpy import save_file

    out = {}
    for k, v in sd.items():
        if k.startswith("features."):
            out[k] = np.ascontiguousarray(v.detach().cpu().numpy())
    assert out, "no features.* keys found — is this a torchvision VGG19 state dict?"
    save_file(out, args.out)
    print(f"Wrote {len(out)} tensors to {args.out}")


if __name__ == "__main__":
    main()
