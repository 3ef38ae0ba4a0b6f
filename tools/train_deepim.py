"""DeepIM refiner train/test CLI (reference core/deepim/main_deepim.py +
train_deepim.sh/test_deepim.sh)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--init-pose-file", default="",
                   help="json with pose_est initial poses for test")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-npz", default="",
                   help="converted reference weights "
                        "(tools/convert_torch_weights.py --kind flownet/"
                        "deepim) loaded over the fresh init")
    p.add_argument("--opts", nargs="*", default=[])
    from self6dpp_tpu.parallel.mesh import add_distributed_args
    add_distributed_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    # multi-host: must run before any other JAX backend use
    from self6dpp_tpu.parallel.mesh import maybe_init_distributed_from_args
    maybe_init_distributed_from_args(args)
    from self6dpp_tpu.config.base import apply_overrides, load_config
    from self6dpp_tpu.engine import deepim_engine as de
    from self6dpp_tpu.engine.trainer import do_train
    from self6dpp_tpu.engine.writers import setup_logger
    from tools.train_gdrn import build_dataset

    from self6dpp_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = apply_overrides(load_config(args.config), args.opts)
    logger = setup_logger(os.path.join(cfg.output_dir, cfg.exp_name))

    ds, models, meta = build_dataset(cfg, train=not args.eval_only)
    model = de.build_deepim(cfg)
    mesh = make_mesh(cfg.dist) if len(jax.devices()) > 1 else None
    rng_np = np.random.default_rng(cfg.seed)

    def to_device(batch):
        from self6dpp_tpu.engine.evaluator import HOST_ONLY_KEYS
        db = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in HOST_ONLY_KEYS}
        db["verts"] = jnp.asarray(models.verts)[db["roi_cls"]]
        db["faces"] = jnp.asarray(models.faces)[db["roi_cls"]]
        db["colors"] = jnp.asarray(models.colors)[db["roi_cls"]]
        db["K"] = db["roi_cam"]
        db["obs_img"] = db.pop("roi_img")
        db["obs_box"] = jnp.concatenate(
            [db["roi_center"] - db["roi_wh"] / 2,
             db["roi_center"] + db["roi_wh"] / 2], axis=1)
        if mesh is not None:
            db = shard_batch(db, mesh, cfg.dist)
        return db

    def simple_batches():
        """init pose = gt + noise (gt_noise scheme, deepim_base.py:38-62:
        15deg rot, (1,1,5)cm trans std)."""
        for raw in ds.batches(cfg.solver.ims_per_batch):
            n = len(raw["gt_rot"])
            from scipy.spatial.transform import Rotation
            dR = Rotation.from_euler(
                "xyz", rng_np.normal(0, 15, (n, 3)), degrees=True).as_matrix()
            raw["init_rot"] = (dR @ raw["gt_rot"]).astype(np.float32)
            raw["init_trans"] = (raw["gt_trans"] + rng_np.normal(
                0, [0.01, 0.01, 0.05], (n, 3))).astype(np.float32)
            yield raw

    batches = simple_batches()
    batch0 = to_device(next(batches))
    state = de.init_state(cfg, model, batch0, mesh=mesh)
    if args.init_npz:
        from self6dpp_tpu.engine.checkpoint import load_params_npz
        tree = load_params_npz(args.init_npz,
                               {"params": state.params,
                                "batch_stats": state.batch_stats},
                               strict=False)
        state = state.replace(params=tree["params"],
                              batch_stats=tree["batch_stats"])

    if args.eval_only:
        from self6dpp_tpu.engine.checkpoint import CheckpointManager
        from self6dpp_tpu.engine.evaluator import (PoseEvaluator,
                                                   run_inference,
                                                   table_to_markdown)
        ckpt = CheckpointManager(f"{cfg.output_dir}/{cfg.exp_name}/ckpt")
        state, _ = ckpt.resume_or_load(state, resume=True)
        step = de.jit_eval_step(cfg, model, mesh=mesh)
        ev = PoseEvaluator(models, meta)
        run_inference(step, state, simple_batches(), ev,
                      to_device=to_device)
        print(table_to_markdown(ev.evaluate()))
        return

    # periodic in-train eval (reference do_test every EVAL_PERIOD inside
    # deepim's do_train; tables go to TB as markdown via the trainer)
    eval_fn = None
    if cfg.test.eval_period > 0:
        from self6dpp_tpu.engine.evaluator import PoseEvaluator, run_inference
        ds_t, models_t, meta_t = build_dataset(cfg, train=False)
        estep = de.jit_eval_step(cfg, model, mesh=mesh)

        def eval_batches():
            for raw in ds_t.batches(cfg.solver.ims_per_batch):
                n = len(raw["gt_rot"])
                from scipy.spatial.transform import Rotation
                g = np.random.default_rng(0)       # fixed eval perturbation
                dR = Rotation.from_euler(
                    "xyz", g.normal(0, 15, (n, 3)),
                    degrees=True).as_matrix()
                raw["init_rot"] = (dR @ raw["gt_rot"]).astype(np.float32)
                raw["init_trans"] = (raw["gt_trans"] + g.normal(
                    0, [0.01, 0.01, 0.05], (n, 3))).astype(np.float32)
                yield raw

        def eval_fn(st):
            ev = PoseEvaluator(models_t, meta_t)
            run_inference(estep, st, eval_batches(), ev, to_device=to_device)
            return ev.evaluate()

    if cfg.deepim.n_iter_train_warm_iters > 0:
        # refine-count warmup ramp: one jitted step per count, built lazily
        steps: dict[int, object] = {}

        def step(state, batch, rng):
            n = de.warm_n_iter(cfg.deepim, int(state.step))
            if n not in steps:
                steps[n] = de.jit_train_step(cfg, model, mesh=mesh, n_iter=n)
            return steps[n](state, batch, rng)
    else:
        step = de.jit_train_step(cfg, model, mesh=mesh)
    do_train(cfg, state, step, batches, to_device, eval_fn=eval_fn,
             resume=args.resume)


if __name__ == "__main__":
    main()
