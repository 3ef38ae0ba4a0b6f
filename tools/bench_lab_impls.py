"""Measure every SelfSupConfig.lab_impl mode end-to-end on the current
accelerator, plus the LAB-off floor — the decision tool for the fusion-cliff
escape work (BENCH_NOTES.md "LAB loss compile pathology").

Each mode times the PRODUCTION path (se.jit_self_train_step: main step plus
whatever side programs the mode compiles) on the flagship bs=8 stage-II
configuration. Emits one JSON line:
  {"metric": "lab_impl_ms_per_step", "value": {<impl>: ms, ...}, ...}

Usage: python tools/bench_lab_impls.py [--iters N] [--impls a,b,c]
First compile of each mode is minutes over the remote-compile tunnel; run
idle (numbers taken while anything else shares the host are ~2x off).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ALL_IMPLS = ("off", "direct", "surrogate", "pallas", "split_grad",
             "pixel_split")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--impls", default=",".join(ALL_IMPLS))
    ap.add_argument("--tiny", action="store_true",
                    help="micro model on CPU — validates the tool, not perf")
    args = ap.parse_args()
    if args.tiny:
        os.environ.setdefault("S6TPU_PLATFORM", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from self6dpp_tpu.config.base import RendererConfig, SelfSupConfig
    from self6dpp_tpu.data.meshes import make_icosphere
    from self6dpp_tpu.data.synthetic import make_gdrn_batch
    from self6dpp_tpu.engine import gdrn_engine as ge
    from self6dpp_tpu.engine import self_engine as se
    from self6dpp_tpu.models.lpips import LPIPS

    bs = args.batch_size
    base = _flagship_cfg(tiny=args.tiny)
    if not args.tiny:
        base = dataclasses.replace(
            base, renderer=RendererConfig(tile_px=32, faces_per_tile=128))

    def cfg_for(impl: str):
        ss = SelfSupConfig(
            enabled=True, mask_lw=1.0, ms_ssim_lw=1.0,
            lab_lw=0.0 if impl == "off" else 0.2,
            lab_impl=impl if impl != "off" else "direct",
            depth_chamfer_lw=1.0,
            perceptual_lw=0.0 if args.tiny else 0.15,
            pseudo_pm_lw=10.0, pseudo_trans_lw=1.0)
        return dataclasses.replace(base, self_sup=ss)

    cfg = cfg_for("direct")
    model = ge.build_gdrn(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_gdrn_batch(cfg, bs).items()}
    verts, faces = make_icosphere(radius=0.06, subdivisions=3)
    colors = (verts - verts.min(0)) / np.ptp(verts, 0)
    C = cfg.model.num_classes
    batch["mesh_verts"] = jnp.asarray(verts)[None].repeat(C, 0)
    batch["mesh_faces"] = jnp.asarray(faces)[None].repeat(C, 0)
    batch["mesh_colors"] = jnp.asarray(colors)[None].repeat(C, 0)
    batch["roi_zoom_K"] = se.roi_zoom_K(batch, cfg.model.input_res,
                                        cfg.model.output_res)
    batch["roi_depth"] = jnp.ones(
        (bs, cfg.model.input_res, cfg.model.input_res)
    ) * batch["gt_trans"][:, 2, None, None]
    state0 = ge.init_state(cfg, model, batch)
    if args.tiny:
        lpips, lp = None, None
    else:
        lpips = LPIPS()
        lp = jax.jit(lpips.init)(jax.random.PRNGKey(1), batch["roi_img"],
                                 batch["roi_img"])["params"]
    rng = jax.random.PRNGKey(0)

    results: dict[str, float] = {}
    for impl in args.impls.split(","):
        impl = impl.strip()
        if impl not in ALL_IMPLS:
            raise SystemExit(f"unknown impl {impl!r}; pick from {ALL_IMPLS}")
        try:
            step = se.jit_self_train_step(cfg_for(impl), model, lpips)
            st = jax.tree.map(jnp.copy, state0)
            t0 = time.perf_counter()
            st, m = step(st, lp, batch, rng)
            jax.block_until_ready(m["total_loss"])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, m = step(st, lp, batch, rng)
            jax.block_until_ready(m["total_loss"])
        except Exception as e:  # one broken mode must not kill the table
            print(f"# {impl}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
            results[impl] = None    # json-safe failure marker
            continue
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        results[impl] = round(ms, 2)
        print(f"# {impl}: {ms:.2f} ms/step  (+compile {compile_s:.0f}s, "
              f"lab={float(m.get('loss_color_ab_obj', 0.0)):.4f})",
              flush=True)

    print(json.dumps({
        "metric": "lab_impl_ms_per_step",
        "value": results,
        "unit": f"ms/step (bs={bs} stage-II, "
                f"{'tiny' if args.tiny else 'flagship'} cfg)",
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
