"""GDR-Net train/test CLI (reference core/gdrn_modeling/main_gdrn.py +
train_gdrn.sh/test_gdrn.sh).

Usage:
  python tools/train_gdrn.py --config configs/gdrn/lm_ape.py [--eval-only]
      [--resume] [--opts solver.base_lr=1e-4 model.num_classes=13]
"""

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
    p.add_argument("--resume", action="store_true")
    p.add_argument("--det-file", default="", help="test detections json")
    p.add_argument("--init-npz", default="",
                   help="flat .npz from tools/convert_torch_weights.py "
                        "(full 'gdrn' tree or 'resnet --prefix backbone' "
                        "partial) loaded over the fresh init")
    p.add_argument("--opts", nargs="*", default=[])
    from self6dpp_tpu.parallel.mesh import add_distributed_args
    add_distributed_args(p)
    return p.parse_args()


def load_init_npz(state, path: str):
    """Overlay converted reference weights (params/batch_stats) on `state`."""
    from self6dpp_tpu.engine.checkpoint import load_params_npz
    tree = {"params": state.params, "batch_stats": state.batch_stats}
    tree = load_params_npz(path, tree, strict=False)
    return state.replace(params=tree["params"],
                         batch_stats=tree["batch_stats"])


def build_dataset(cfg, train: bool, det_file: str = "",
                  dataset_names: tuple[str, ...] | None = None):
    from self6dpp_tpu.data.bop import (inject_detections, load_bop_split,
                                       load_detections)
    from self6dpp_tpu.data.loader import GDRNDataset, ObjectModels
    from self6dpp_tpu.data.ref import get_meta

    names = dataset_names if dataset_names else (
        cfg.data.train_datasets if train else cfg.data.test_datasets)
    name = names[0]
    meta = get_meta(name)
    split = "train" if train else "test"
    split_dir = os.path.join(cfg.data.dataset_root, meta.name, split)
    obj_ids = None
    if cfg.data.object_filter:
        obj_ids = {meta.obj2id[o] for o in cfg.data.object_filter}
    records = load_bop_split(split_dir, obj_ids=obj_ids,
                             visib_thresh=cfg.data.filter_visib_thr)
    if det_file:
        records = inject_detections(records, load_detections(det_file),
                                    top_k_per_obj=cfg.data.det_topk_per_obj,
                                    score_thresh=cfg.data.det_thresh)
    model_dir = os.path.join(cfg.data.dataset_root, meta.name, "models")
    models = ObjectModels.from_ply_files(
        meta.objects,
        [meta.model_path(cfg.data.dataset_root, o) for o in meta.objects],
        n_regions=cfg.model.geo_head.num_regions,
        n_points=cfg.data.model_points, max_sym=cfg.data.max_sym_rots,
        sym_names=meta.sym_objects)
    return GDRNDataset(cfg, records, models, meta, train=train,
                       seed=cfg.seed), models, meta


def main():
    args = parse_args()
    # multi-host: must run before any other JAX backend use
    from self6dpp_tpu.parallel.mesh import maybe_init_distributed_from_args
    maybe_init_distributed_from_args(args)
    from self6dpp_tpu.config.base import apply_overrides, load_config
    from self6dpp_tpu.engine import gdrn_engine as eng
    from self6dpp_tpu.engine.evaluator import (PoseEvaluator, run_inference,
                                               save_bop_csv, table_to_markdown)
    from self6dpp_tpu.engine.trainer import do_train
    from self6dpp_tpu.engine.writers import setup_logger
    from self6dpp_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = apply_overrides(load_config(args.config), args.opts)
    logger = setup_logger(os.path.join(cfg.output_dir, cfg.exp_name))
    logger.info(f"devices: {jax.devices()}")

    model = eng.build_gdrn(cfg)
    mesh = make_mesh(cfg.dist) if len(jax.devices()) > 1 else None

    def to_device(batch):
        from self6dpp_tpu.engine.evaluator import HOST_ONLY_KEYS
        db = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in HOST_ONLY_KEYS}
        if mesh is not None:
            db = shard_batch(db, mesh, cfg.dist)
        return db

    if args.eval_only:
        ds, models, meta = build_dataset(cfg, train=False,
                                         det_file=args.det_file)
        batch0 = next(ds.batches(cfg.solver.ims_per_batch, infinite=True))
        state = eng.init_state(cfg, model, to_device(batch0), mesh=mesh)
        if args.init_npz:
            state = load_init_npz(state, args.init_npz)
        else:
            from self6dpp_tpu.engine.checkpoint import CheckpointManager
            ckpt = CheckpointManager(f"{cfg.output_dir}/{cfg.exp_name}/ckpt")
            state, _ = ckpt.resume_or_load(state, resume=True)
        step = eng.jit_eval_step(cfg, model, mesh=mesh)
        ev = PoseEvaluator(models, meta)
        run_inference(step, state, ds.batches(cfg.solver.ims_per_batch),
                      ev, to_device=lambda b: to_device(b))
        # BOP19 VSD/MSSD/MSPD average recall when the config's error_types
        # ask for it (reference --error_types ad,proj,rete,vsd,mssd,mspd,
        # eval_pose_results_more.py:10)
        bop19 = bool({"vsd", "mssd", "mspd"} & set(cfg.test.error_types))
        tables = ev.evaluate(bop19=bop19)
        print(table_to_markdown(tables))
        save_bop_csv(
            f"{cfg.output_dir}/{cfg.exp_name}/results-bop.csv",
            ev.results_for_csv())
        return

    ds, models, meta = build_dataset(cfg, train=True)
    batches = ds.batches(cfg.solver.ims_per_batch)
    batch0 = to_device(next(batches))
    state = eng.init_state(cfg, model, batch0, mesh=mesh)
    if args.init_npz:
        state = load_init_npz(state, args.init_npz)
    step = eng.jit_train_step(cfg, model, mesh=mesh)

    # periodic in-training evaluation on the test split (reference
    # engine.py:445-520 runs do_test every EVAL_PERIOD)
    eval_fn = None
    if cfg.test.eval_period > 0:
        ds_t, models_t, meta_t = build_dataset(cfg, train=False,
                                               det_file=args.det_file)
        estep = eng.jit_eval_step(cfg, model, mesh=mesh)

        def eval_fn(st):
            ev = PoseEvaluator(models_t, meta_t)
            run_inference(estep, st, ds_t.batches(cfg.solver.ims_per_batch),
                          ev, to_device=to_device)
            return ev.evaluate()

    do_train(cfg, state, step, batches, to_device, eval_fn=eval_fn,
             resume=args.resume)


if __name__ == "__main__":
    main()
