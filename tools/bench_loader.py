"""Measure data-loader throughput (imgs/sec) in isolation.

The reference feeds its ~70 imgs/s GPU step from NUM_WORKERS torch
DataLoader worker processes (core/gdrn_modeling/datasets/data_loader.py:
1146-1214).  Here the per-sample host work (IO, aug, warp-affine crops,
SITE targets) runs on a thread pool and the render-dependent labels come
from ONE batched host-CPU rasterizer call per batch; this script measures
that pipeline end-to-end (sample building -> collated batches) without any
training step, so the figure composes with the step rates in
BENCH_NOTES.md.

Usage: python tools/bench_loader.py [--workers N] [--batch-size B]
       [--batches N] [--vf-norm]
Writes one JSON line like bench.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# keep the bench CPU-only: the loader pins its renders to the host backend
# anyway, but never let the import of jax grab the TPU tunnel
os.environ.setdefault("S6TPU_PLATFORM", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=None,
                    help="thread-pool size; default = sweep 0/2/4/8")
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--vf-norm", action="store_true",
                    help="also emit gt_vf/gt_norm labels")
    ap.add_argument("--root", default="/tmp/bopdata_loaderbench")
    ap.add_argument("--sim-io-ms", type=float, default=0.0,
                    help="inject a GIL-releasing wait (ms) per sample to "
                         "model cold-imread latency; demonstrates worker "
                         "overlap even on a 1-core host (the wait sleeps, "
                         "so threads hide it behind each other exactly as "
                         "they hide real IO on production hosts)")
    args = ap.parse_args()

    import self6dpp_tpu  # noqa: F401  (applies S6TPU_PLATFORM)
    from self6dpp_tpu.config.base import Config, DataConfig, GeoHeadConfig
    from self6dpp_tpu.data.loader import GDRNDataset
    from tools.make_synthetic_bop import generate_full
    from tools.train_gdrn import build_dataset

    if not os.path.exists(os.path.join(args.root, "lm", "train")):
        generate_full(args.root, n_images=48)

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            geo_head=dataclasses.replace(
                cfg.model.geo_head, with_vf=args.vf_norm,
                with_norm=args.vf_norm, num_vf_points=8)),
        data=DataConfig(train_datasets=("synthetic",),
                        dataset_root=args.root,
                        color_aug_prob=0.8, bg_replace_prob=0.0),
    )
    ds0, models, meta = build_dataset(cfg, train=True)

    if args.sim_io_ms > 0:
        import time

        orig = GDRNDataset._sample_host

        def slow(self, ri, ii, rng=None):
            time.sleep(args.sim_io_ms / 1e3)
            return orig(self, ri, ii, rng=rng)

        GDRNDataset._sample_host = slow

    def measure(workers: int) -> float:
        ds = GDRNDataset(cfg, ds0.records, models, meta, train=True)
        it = ds.batches(args.batch_size, num_workers=workers, prefetch=2)
        # warm: jit of the GT render + one full pass over the instances so
        # the label cache reaches steady state (real runs are many epochs)
        warm = max(2, len(ds) // args.batch_size + 1)
        for _ in range(warm):
            next(it)
        t0 = time.perf_counter()
        for _ in range(args.batches):
            next(it)
        dt = time.perf_counter() - t0
        it.close()
        return args.batches * args.batch_size / dt

    sweep = [args.workers] if args.workers is not None else [0, 2, 4, 8]
    results = {w: measure(w) for w in sweep}
    for w, v in results.items():
        print(f"# workers={w}: {v:.1f} imgs/s", file=sys.stderr)
    best_w = max(results, key=results.get)
    print(json.dumps({
        "metric": f"gdrn_loader_imgs_per_sec_bs{args.batch_size}"
                  + ("_vfnorm" if args.vf_norm else "")
                  + (f"_simio{args.sim_io_ms:g}ms" if args.sim_io_ms else ""),
        "value": round(results[best_w], 1),
        "unit": "imgs/s",
        "workers": best_w,
        "sweep": {str(w): round(v, 1) for w, v in results.items()},
    }))


if __name__ == "__main__":
    main()
