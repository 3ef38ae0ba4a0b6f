"""Convert reference PyTorch checkpoints to flat .npz for Flax loading.

Parity context (SURVEY.md §7 hard part 3 — weight parity): the reference
model zoo ships .pth checkpoints (timm resnest50d backbone, GDRN heads,
FlowNetS). This tool dumps any torch checkpoint to a flat
'name -> numpy array' .npz with layout conversion:
  conv OIHW -> HWIO, linear (out,in) -> (in,out), BN buffers kept.
Model-specific name mapping into the Flax trees lives in MAPPING_* tables
below (extend per architecture as checkpoints are ported).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def torch_state_to_numpy(state_dict) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        a = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        if a.ndim == 4:                      # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2 and (k.endswith("weight") or ".fc" in k):
            a = a.T                          # linear (out,in) -> (in,out)
        out[k] = a
    return out


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    assert isinstance(ckpt, dict), type(ckpt)
    return torch_state_to_numpy(ckpt)


# LPIPS (external/PerceptualSimilarity alexnet) name mapping into
# models/lpips.py load_lpips_params contract
LPIPS_ALEX_MAP = {
    "net.slice1.0": "conv1", "net.slice2.3": "conv2", "net.slice3.6": "conv3",
    "net.slice4.8": "conv4", "net.slice5.10": "conv5",
    "lin0.model.1": "lin0", "lin1.model.1": "lin1", "lin2.model.1": "lin2",
    "lin3.model.1": "lin3", "lin4.model.1": "lin4",
}


def convert_lpips(src: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for tk, ok in LPIPS_ALEX_MAP.items():
        if f"{tk}.weight" in src:
            w = src[f"{tk}.weight"]
            if ok.startswith("lin"):
                out[f"{ok}.weight"] = w.reshape(-1)
            else:
                out[f"{ok}.weight"] = w
        if f"{tk}.bias" in src:
            out[f"{ok}.bias"] = src[f"{tk}.bias"]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="torch .pth checkpoint")
    p.add_argument("--out", required=True, help="output .npz")
    p.add_argument("--kind", default="raw", choices=["raw", "lpips"])
    args = p.parse_args()
    flat = load_torch_checkpoint(args.src)
    if args.kind == "lpips":
        flat = convert_lpips(flat)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays -> {args.out}")


if __name__ == "__main__":
    main()
