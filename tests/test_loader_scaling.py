"""Worker-pool overlap proof for the GDRN data loader (VERDICT r3 #8).

The sandbox exposes ONE CPU core (`nproc`=1), so pure-compute thread scaling
is physically impossible to observe here — that was the standing
"extrapolated" caveat on the loader's multi-core claim. What IS measurable
on one core is the pipeline's OVERLAP property: when the per-sample host
stage blocks on a GIL-releasing wait (the kernel-wait a cold imread performs
— the real bottleneck on production hosts, 3 imreads per sample,
reference data_loader.py:1146-1214 hides it behind NUM_WORKERS processes),
the thread pool must hide the waits behind each other. We inject such a
wait into _sample_host and require near-linear scaling with workers — which
can only happen if pool.map genuinely overlaps the waits with each other
and with the batched-BLAS finish stage.
"""

import time

import numpy as np
import pytest

from self6dpp_tpu.config.base import (BackboneConfig, Config, DataConfig,
                                      GeoHeadConfig, PnPNetConfig,
                                      PoseNetConfig)
from self6dpp_tpu.data.loader import GDRNDataset, ObjectModels
from self6dpp_tpu.data.bop import load_bop_split
from self6dpp_tpu.data.meshes import make_cube, make_icosphere
from self6dpp_tpu.data.ref import get_meta


@pytest.fixture(scope="module")
def pieces(tmp_path_factory):
    from tools.make_synthetic_bop import generate

    root = tmp_path_factory.mktemp("bop_scale")
    split = generate(str(root), n_scenes=1, n_images=3)
    records = load_bop_split(split)
    v1, f1 = make_cube(size=0.12)
    v2, f2 = make_icosphere(radius=0.07, subdivisions=2)
    models = ObjectModels.from_meshes(
        ["ape", "can"],
        [{"verts": v1, "faces": f1}, {"verts": v2, "faces": f2}],
        n_regions=8, n_points=64, max_sym=4)
    cfg = Config(
        model=PoseNetConfig(
            num_classes=2, input_res=64, output_res=16,
            backbone=BackboneConfig(name="resnet18"),
            geo_head=GeoHeadConfig(feat_dim=16, num_gn_groups=4, num_regions=8),
            pnp_net=PnPNetConfig(featdim=16, num_gn_groups=4)),
        data=DataConfig(color_aug_prob=0.0))
    return cfg, records, models, get_meta("lm")


IO_WAIT_S = 0.025          # dominant vs the ~ms compute stages (ADVICE r4:
BS, N_BATCHES = 8, 5       # keep the injected wait large so a loaded host
                           # cannot flip the scaling assertion)


def _throughput(cfg, records, models, meta, workers: int) -> float:
    ds = GDRNDataset(cfg, records, models, meta, train=True)
    it = ds.batches(BS, num_workers=workers, prefetch=0)
    for _ in range(2):                      # warm: render-cache + jit
        next(it)
    t0 = time.perf_counter()
    for _ in range(N_BATCHES):
        next(it)
    dt = time.perf_counter() - t0
    it.close()
    return N_BATCHES * BS / dt


def test_workers_overlap_io_wait(pieces, monkeypatch):
    cfg, records, models, meta = pieces
    orig = GDRNDataset._sample_host

    def slow(self, ri, ii, rng=None):
        time.sleep(IO_WAIT_S)               # GIL-releasing kernel wait
        return orig(self, ri, ii, rng=rng)

    monkeypatch.setattr(GDRNDataset, "_sample_host", slow)
    # serial pays BS*IO_WAIT per batch (~200ms) fully; 4 workers must hide
    # >= half of it even with every compute stage contending for the 1 core.
    # One retry absorbs wall-clock noise on a loaded host (ADVICE r4).
    for attempt in range(2):
        serial = _throughput(cfg, records, models, meta, workers=0)
        pooled = _throughput(cfg, records, models, meta, workers=4)
        if pooled > 1.8 * serial:
            return
    assert pooled > 1.8 * serial, (serial, pooled)


def test_worker_pool_output_deterministic(pieces):
    """Pooled and serial paths build identical batches (same spawned rngs
    per sample, order preserved by pool.map)."""
    cfg, records, models, meta = pieces
    ds1 = GDRNDataset(cfg, records, models, meta, train=False)
    ds2 = GDRNDataset(cfg, records, models, meta, train=False)
    b1 = next(ds1.batches(4, num_workers=0, prefetch=0))
    b2 = next(ds2.batches(4, num_workers=4, prefetch=0))
    assert set(b1) == set(b2)
    for k in b1:
        np.testing.assert_allclose(b1[k], b2[k], atol=1e-6, err_msg=k)
