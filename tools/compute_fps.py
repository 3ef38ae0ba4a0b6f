"""Compute FPS keypoints / region centers for a model directory.

Parity target: core/gdrn_modeling/tools/lm/lm_1_compute_fps.py — writes
fps_points.json (keyed by str(obj_id), metres) next to the models.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", required=True)
    p.add_argument("--num-points", type=int, default=64)
    p.add_argument("--out", default="")
    args = p.parse_args()

    from self6dpp_tpu.data.meshes import load_ply
    from self6dpp_tpu.ops.fps import fps_points

    out: dict[str, list] = {}
    for name in sorted(os.listdir(args.model_dir)):
        if not name.endswith(".ply"):
            continue
        obj_id = int(name.split("_")[-1].split(".")[0])
        mesh = load_ply(os.path.join(args.model_dir, name))
        verts = mesh["verts"] * 1e-3          # mm -> m (BOP)
        pts = fps_points(verts, args.num_points)
        out[str(obj_id)] = pts.tolist()
        print(f"obj {obj_id}: {len(verts)} verts -> {len(pts)} fps points")

    dst = args.out or os.path.join(args.model_dir, "fps_points.json")
    with open(dst, "w") as f:
        json.dump(out, f)
    print("wrote", dst)


if __name__ == "__main__":
    main()
