"""A/B probe: stage-II step rate at two batch sizes, trials interleaved.

The sandbox TPU rides a shared tunnel with minute-scale load swings, so
back-to-back `bench.py --bs N` runs are not comparable. This compiles both
batch sizes once, then interleaves timed windows A/B/A/B... and reports
best + median per arm. Usage: python tools/probes/bs_ab_probe.py [bs_a bs_b]
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np


def build(batch_size):
    """Exact bench configuration via bench.build_stage2."""
    from bench import build_stage2

    cfg, model, state, lp, step, batch = build_stage2(batch_size)
    rng = jax.random.PRNGKey(0)
    state, metrics = step(state, lp, batch, rng)   # compile
    jax.block_until_ready(metrics["total_loss"])

    holder = {"state": state}

    def timed(iters=50):
        s = holder["state"]
        t0 = time.perf_counter()
        for _ in range(iters):
            s, m = step(s, lp, batch, rng)
        jax.block_until_ready(m["total_loss"])
        holder["state"] = s
        return iters / (time.perf_counter() - t0)

    return timed


def main():
    bs_a = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bs_b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ta = build(bs_a)
    tb = build(bs_b)
    ra, rb = [], []
    for trial in range(5):
        ra.append(ta())
        rb.append(tb())
        print(f"trial {trial}: bs={bs_a} {ra[-1]:7.1f} it/s   "
              f"bs={bs_b} {rb[-1]:7.1f} it/s", flush=True)
    for name, r, bs in ((f"bs={bs_a}", ra, bs_a), (f"bs={bs_b}", rb, bs_b)):
        best, med = max(r), float(np.median(r))
        print(f"{name}: best {best:7.1f} it/s ({best * bs:7.0f} imgs/s)  "
              f"median {med:7.1f} it/s ({med * bs:7.0f} imgs/s)")


if __name__ == "__main__":
    main()
