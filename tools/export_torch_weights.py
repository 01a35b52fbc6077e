#!/usr/bin/env python
"""Export a PyTorch checkpoint (.pt state dict) to .npz for --weights loading.

Bridges reference-trained checkpoints (e.g. result/nucla/CTROGC-GCN.pt,
torchlight io.py:101-107 format) into this framework: the .npz feeds the
trainer's --weights path, which maps names via utils/torch_import.

    python tools/export_torch_weights.py ckpt.pt out.npz
"""
from __future__ import annotations

import sys

import numpy as np


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 2
    src, dst = argv
    import torch

    obj = torch.load(src, map_location="cpu", weights_only=False)
    state = obj.state_dict() if hasattr(obj, "state_dict") else obj
    if "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    arrays = {
        k: v.detach().cpu().numpy()
        for k, v in state.items()
        if hasattr(v, "detach")
    }
    np.savez(dst, **arrays)
    print(f"exported {len(arrays)} tensors -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
