"""Typed configuration system.

Replaces the reference's mmcv python-file configs with `_base_` inheritance
and string-eval'd snippets (configs/_base_/*.py, core/*/main_*.py:57-59 —
hazards noted in SURVEY.md §5) by plain frozen dataclasses:

  * every knob is a typed field with a default — no silent typos;
  * config files are python modules exporting `get_config() -> Config`
    (imported via importlib, never eval());
  * `replace()` (dataclasses.replace) gives functional overrides;
  * CLI `--opts a.b.c=value` deep-merge is supported with type coercion.
"""

from __future__ import annotations

import dataclasses
import importlib.util
from dataclasses import dataclass, field
from typing import Any


# ---------------------------------------------------------------------------
# model configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BackboneConfig:
    # resnet{18,34,50,101}[d] | resnest{26,50}d | darknet53 | flownets |
    # cspdarknet | pvnet_resnet{18,34,50}_8s (dilated encoder-decoder)
    name: str = "resnest50d"
    freeze: bool = False
    pretrained: str = ""            # path to a checkpoint to warm-start from
    input_channels: int = 3
    out_indices: tuple[int, ...] = (4,)   # stage indices to return (4 = stride 32)


@dataclass(frozen=True)
class GeoHeadConfig:
    # TopDownMaskXyzRegionHead (+DoubleMask/DoubleVF/MaskNormVF via the
    # num_masks/with_vf/with_norm flags) | ConvMaskXyzRegionHead |
    # FPNMaskXyzRegionHead (net_factory.py:80-87)
    name: str = "TopDownMaskXyzRegionHead"
    freeze: bool = False
    up_types: tuple[str, ...] = ("deconv", "bilinear", "bilinear")
    deconv_kernel_size: int = 3
    num_conv_per_block: int = 2
    num_feat_layers: int = 2        # ConvMaskXyzRegionHead trunk depth
    feat_dim: int = 256
    feat_kernel_size: int = 3
    norm: str = "GN"
    num_gn_groups: int = 32
    act: str = "gelu"
    out_kernel_size: int = 1
    out_layer_shared: bool = True
    # class-aware outputs (reference GDRN.py:106-124)
    xyz_class_aware: bool = False
    mask_class_aware: bool = False
    region_class_aware: bool = False
    num_regions: int = 64
    xyz_bin: int = 64               # only used when xyz_loss_type == CE_coor
    # number of mask channels: 1 = visib only; 2 = visib+full (double-mask)
    num_masks: int = 1
    with_vf: bool = False           # double vector-field heads (self6dpp variant)
    with_norm: bool = False         # surface-normal head (GDRN_MaskNormVF)
    # keypoints per VF head: channels = {u,v} x {vis,full} x num_vf_points
    # (reference vf_out_dim=2*2*16,
    # top_down_doublemask_doublevf_xyz_region_head.py:31)
    num_vf_points: int = 16


@dataclass(frozen=True)
class PnPNetConfig:
    name: str = "ConvPnPNet"        # ConvPnPNet | ConvPnPNetMaskNormVF | SimplePointPnPNet
    with_extent_feat: bool = False  # ConvPnPNetCls-style extent embedding
    freeze: bool = False
    featdim: int = 128
    rot_type: str = "allo_rot6d"    # allo_rot6d | ego_rot6d | allo_quat | ego_quat
    trans_type: str = "centroid_z"  # centroid_z | centroid_z_abs | trans
    z_type: str = "REL"             # REL | ABS
    num_stride2_layers: int = 3
    num_extra_layers: int = 0
    norm: str = "GN"
    num_gn_groups: int = 32
    act: str = "leakyrelu"
    drop_prob: float = 0.0
    flat_op: str = "flatten"        # flatten | avg | avg-max | avg-max-min
    denormalize_by_extent: bool = True
    with_2d_coord: bool = True
    coord_2d_type: str = "abs"      # abs | rel
    region_attention: bool = True
    mask_attention: str = "none"    # none | mul | concat


@dataclass(frozen=True)
class LossConfig:
    # xyz
    xyz_loss_type: str = "L1"       # L1 | CE_coor
    xyz_loss_mask_gt: str = "visib" # trunc | visib | obj
    xyz_lw: float = 1.0
    # mask
    mask_loss_type: str = "BCE"     # L1 | BCE | RW_BCE | dice | CE
    mask_loss_gt: str = "trunc"
    mask_lw: float = 1.0
    full_mask_lw: float = 1.0       # for double-mask variants
    # region
    region_loss_type: str = "CE"
    region_loss_mask_gt: str = "visib"
    region_lw: float = 1.0
    # point matching
    pm_lw: float = 1.0
    pm_loss_type: str = "L1"
    pm_smooth_l1_beta: float = 1.0
    pm_norm_by_extent: bool = False
    pm_loss_sym: bool = True
    pm_disentangle_t: bool = False
    pm_disentangle_z: bool = False
    pm_t_use_points: bool = True
    pm_r_only: bool = True
    # others
    rot_lw: float = 0.0
    rot_loss_type: str = "angular"
    centroid_lw: float = 1.0
    centroid_loss_type: str = "L1"
    z_lw: float = 1.0
    z_loss_type: str = "L1"
    trans_lw: float = 0.0
    trans_loss_type: str = "L1"
    trans_loss_disentangle: bool = True
    bind_lw: float = 0.0
    bind_loss_type: str = "L1"
    # vf / normal losses (self6dpp variants)
    vf_lw: float = 0.0
    norm_lw: float = 0.0


@dataclass(frozen=True)
class PoseNetConfig:
    name: str = "GDRN"              # GDRN | GDRN_double_mask | GDRN_double_mask_double_vf | GDRN_MaskNormVF
    num_classes: int = 13
    input_res: int = 256
    output_res: int = 64
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    geo_head: GeoHeadConfig = field(default_factory=GeoHeadConfig)
    pnp_net: PnPNetConfig = field(default_factory=PnPNetConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    use_mtl: bool = False           # uncertainty multi-task weighting
    # optional FPN neck between backbone and geo head (gdrn_base.py:47-57,
    # ENABLED=False in every shipped reference config); "fpn" requires
    # backbone.out_indices to select the pyramid stages
    neck: str = "none"              # none | fpn
    neck_out_channels: int = 256


@dataclass(frozen=True)
class DeepIMConfig:
    """DeepIM render-and-compare refiner (core/deepim/models/DeepIM_FlowNet.py).

    The refine loop runs as lax.scan with in-graph re-rendering — one XLA
    graph for all n_iter iterations (vs the reference's python loop with EGL
    round-trips, core/deepim/engine/engine.py:275-365)."""
    # DeepIM_FlowNet | DeepIM_Shared | DeepIM_Unshared (net_factory.py:99-103)
    name: str = "DeepIM_FlowNet"
    num_classes: int = 13
    input_h: int = 512
    input_w: int = 512
    in_channels: int = 6            # 6 = rgb ren+obs; 8 adds mask channels
    # flownets, or any ResNetBackbone arch for the Shared/Unshared variants
    backbone: str = "flownets"
    use_bn: bool = False
    flat_op: str = "avg"            # flatten | avg | avg-max | avg-max-min
    rot_type: str = "ego_rot6d"
    z_style: str = "cosypose"       # cosypose | deepim
    t_space: str = "image"
    t_weight: float = 1.0
    pose_feat_dim: int = 256
    pose_num_layers: int = 2
    with_mask_head: bool = True
    mask_class_aware: bool = False
    with_flow: bool = True          # supervise flow4
    n_iter_train: int = 4
    # warmup ramp: refine-iteration count grows from 1 to n_iter_train over
    # the first n_iter_train_warm_iters training iterations (reference
    # N_ITER_TRAIN_WARM_EPOCH, core/deepim/engine/engine.py:275-294;
    # iteration-based here as the trainer is epoch-less). 0 disables.
    n_iter_train_warm_iters: int = 0
    n_iter_test: int = 4
    zoom_lamb: float = 1.4
    # losses
    pm_lw: float = 10.0
    pm_loss_sym: bool = True
    pm_r_only: bool = False
    pm_disentangle_z: bool = True
    flow_lw: float = 0.1
    mask_lw: float = 1.0
    mask_loss_type: str = "BCE"
    trans_lw: float = 1.0
    rot_lw: float = 0.0
    use_mtl: bool = False


# ---------------------------------------------------------------------------
# solver / schedule
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SolverConfig:
    optimizer: str = "ranger"       # ranger | (r)adam(w|p|belief) | sgd(_gc) | sgdp | madgrad
    base_lr: float = 1e-4
    weight_decay: float = 0.0
    momentum: float = 0.9
    # flat-and-anneal schedule (lib/torch_utils/solver/lr_scheduler.py:148-266)
    lr_sched: str = "flat_and_anneal"
    anneal_method: str = "cosine"   # cosine | step | poly | linear
    anneal_point: float = 0.72
    warmup_iters: int = 1000
    warmup_factor: float = 0.001
    warmup_method: str = "linear"
    poly_power: float = 1.0
    step_gamma: float = 0.1
    steps: tuple[float, ...] = (0.5, 0.75)   # rel positions for step anneal
    grad_clip_norm: float = 35.0    # 0 disables
    total_iters: int = 100_000
    ims_per_batch: int = 24
    reference_bs: int = 24          # grad accumulation target batch size
    ema_decay: float = 0.999        # EMA of student weights
    ema_warmup_iters: int = 2000


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DZIConfig:
    """Dynamic zoom-in bbox augmentation (core/base_data_loader.py:179-217)."""
    type: str = "uniform"           # uniform | truncnorm | none | roi10d
    pad_scale: float = 1.5
    scale_ratio: float = 0.25
    shift_ratio: float = 0.25


@dataclass(frozen=True)
class DataConfig:
    dataset_root: str = "datasets"
    train_datasets: tuple[str, ...] = ("lm_pbr_13_train",)
    train2_datasets: tuple[str, ...] = ()      # syn-sup set for stage II
    train2_ratio: float = 0.0
    test_datasets: tuple[str, ...] = ("lm_13_test",)
    det_files_train: tuple[str, ...] = ()      # pseudo-pose detection jsons
    det_files_test: tuple[str, ...] = ()
    det_topk_per_obj: int = 1
    det_thresh: float = 0.0
    input_res: int = 256
    output_res: int = 64
    dzi: DZIConfig = field(default_factory=DZIConfig)
    color_aug_prob: float = 0.0
    bg_replace_prob: float = 0.5    # for syn data; bg_type dir
    bg_dir: str = ""
    num_workers: int = 4            # thread-pool size for per-sample host work
    prefetch: int = 2               # assembled batches buffered ahead
    # per-instance GT-render cache (the reference's offline xyz_crop pkl
    # path): render each instance once in a jitter-covering frame, warp per
    # crop. res 0 = auto (2*output_res); entries bound host RAM (fp16).
    label_cache: bool = True
    label_cache_res: int = 0
    label_cache_entries: int = 20000
    # training index sampler (my_distributed_sampler parity):
    # training | repeat_factor | inf_subset
    sampler: str = "training"
    repeat_thresh: float = 0.01     # repeat_factor sampler threshold
    subset_ratio: float = 1.0       # inf_subset per-epoch subset fraction
    filter_visib_thr: float = 0.0
    with_depth: bool = False        # emit roi_depth crops (stage-II chamfer)
    depth_aug_prob: float = 0.0     # add_noise_depth probability (train)
    depth_aug_level: float = 0.1
    # SISO protocol: restrict train/test to these object names (the reference
    # ships one config per object, e.g. ..._lm_pbr_100e_ape.py); empty = all
    object_filter: tuple[str, ...] = ()
    truncate_fg: bool = False
    model_points: int = 512         # FPS-sampled PM-loss points (fixed shape)
    max_sym_rots: int = 32          # padded symmetry rotation set


# ---------------------------------------------------------------------------
# test / eval
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TestConfig:
    eval_period: int = 0
    test_bbox_type: str = "est"     # est | gt
    # reference default error list (eval_pose_results_more.py:198):
    # vsd/mssd/mspd switch --eval-only to also emit the BOP19
    # average-recall table (rendered-depth VSD + symmetry-aware MSSD/MSPD)
    error_types: tuple[str, ...] = ("ad", "rete", "re", "te", "proj",
                                    "vsd", "mssd", "mspd")
    use_pnp: bool = False
    pnp_type: str = "ransac_pnp"
    save_results_only: bool = False


# ---------------------------------------------------------------------------
# renderer
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RendererConfig:
    width: int = 640
    height: int = 480
    znear: float = 0.01
    zfar: float = 10.0
    # soft rasterization constants (DIB-R semantics,
    # lib/dr_utils/dib_renderer_x/rasterizer/rasterizer.py: knum=30,
    # delta=7000, multiplier=1000)
    sigma: float = 1.0 / 7000.0
    gamma: float = 1.0 / 7000.0
    max_faces: int = 8192           # static per-object face budget
    # tile/K budget guidance (measured sweep in BENCH_NOTES.md): exactness
    # needs K >= max overlapping faces per tile. ~1-2k-face meshes: 32px/128
    # (fastest, exact). ~5k faces: 16px/256 is exact; 32px/256 is ~1.9x
    # faster but can shed silhouette-rim pixels (overflow keeps nearest-K).
    tile_px: int = 16
    faces_per_tile: int = 128       # K candidates per tile (lane multiple)
    impl: str = "auto"              # auto | xla | pallas (fused TPU kernel)


# ---------------------------------------------------------------------------
# top-level
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SelfSupConfig:
    """Stage-II self-supervised loss weights (core/self6dpp engine)."""
    enabled: bool = False
    mask_lw: float = 1.0
    mask_loss_type: str = "RW_BCE"  # RW_BCE | dice | BCE
    mask_edge_reweight: bool = True
    perceptual_lw: float = 0.15
    ms_ssim_lw: float = 1.0
    lab_lw: float = 0.0
    lab_no_l: bool = True
    # How the LAB term is computed. ANY formulation that places LAB color
    # ops in the same XLA program as the model/render graph triggers a TPU
    # fusion cliff (~10x step cost) — even forward-only pixel math with no
    # backward (+10 ms on a 1 ms forward). Measured end-to-end, bs=8,
    # lab_lw=0.2 (BENCH_NOTES.md "LAB loss compile pathology"):
    #   direct      — in-graph autodiff term:                  ~40 ms/step
    #   surrogate   — in-graph stop-grad linear re-entry:      ~40 ms/step
    #   split_grad  — second fwd+render+d(lab)/d(params) jit:  ~64 ms/step
    #   pixel_split — three programs: LAB-free fwd -> pixel-local LAB
    #                 (val, d(lab)/d(color)) -> main step whose graph sees
    #                 only an elementwise cotangent add (exact value AND
    #                 gradient). Each program is individually fast (fwd
    #                 1.1 ms, pixel 1.4 ms, main step 6.8 ms — every
    #                 model-bearing program stays fused), but the 3-program
    #                 cycle measures ~50 ms on the current tunneled backend:
    #                 an inter-program overhead that is still unattributed.
    #   pallas      — in-graph, but the whole LAB (value, d/d(color))
    #                 computation is ONE fused Pallas kernel, opaque to the
    #                 fusion pass; the gradient re-enters via the same
    #                 cotangent add as pixel_split (ops/lab_pallas.py).
    #                 Single program, exact — and the cliff escape that
    #                 works: 6.65 ms/step vs direct's 39.6 on TPU v5e
    #                 (bs=8 flagship stage-II, tools/bench_lab_impls.py).
    # Default is the fastest *end-to-end measured* mode (BENCH_NOTES.md
    # round-4 decision table).
    lab_impl: str = "pallas"   # direct|surrogate|split_grad|pixel_split|pallas
    depth_chamfer_lw: float = 0.0
    chamfer_dist_thr: float = 0.05
    chamfer_center_lw: float = 0.0
    vf_lw: float = 0.0
    norm_lw: float = 0.0
    pseudo_pm_lw: float = 10.0
    pseudo_trans_lw: float = 0.0
    ema_teacher: bool = True
    ema_decay: float = 0.999
    teacher_update_freq: int = 1    # epochs between EMA teacher refreshes
    geo_mode_ratio: float = 0.0     # fraction of iters in 'geo' output mode
    # pose/geo interleave schedule. "random" = independent draw at
    # geo_mode_ratio per iteration — this IS the live reference behavior
    # (data_loader_self.py:742-748 step(): np.random.rand() < geo_mode_prob;
    # the strict every-other-batch __switch_output_mode at :728-740 is
    # commented-out dead code there). "alternate" = deterministic interleave
    # hitting the same marginal ratio (geo every round(1/ratio) iters);
    # "fix_pose"/"fix_geo" pin the mode (the reference's 'fix').
    mode_schedule: str = "random"   # random | alternate | fix_pose | fix_geo
    # POSE_VARIATED_AUG for the geo branch (new_cfg/base.py:34-50): shared
    # in-graph affine warp of the student ROI and the teacher pseudo maps
    geo_aug_rot_deg: float = 180.0  # ROT.MAX_DEGREE // 2
    geo_aug_zoom: tuple[float, float] = (0.75, 1.25)
    geo_aug_trans: tuple[float, float] = (-0.1, 0.1)
    geo_aug_crop: float = 0.1       # CropAndPad percent
    # pseudo pose source when no refined pose is loaded: the teacher's own
    # prediction (reference batch_data_self_pose fallback,
    # self_engine_utils.py:1073-1140) — never ground truth
    pseudo_pose_type: str = "pose_refine"   # pose_refine | pose_est | teacher
    # DeepIM refiner in the loop (the "++"): refine the pseudo pose in-graph
    # before the loss (reference main_self6dpp.py:231-245, refiner_engine.py)
    refine_with_deepim: bool = False
    refiner_config: str = ""        # config file for the refiner model
    refiner_weights: str = ""       # ckpt dir or .npz for the refiner
    # RepjRefiner multi-view weak supervision (reference
    # self_engine.py:549-569, weights configs/self6dpp/new_cfg/base.py:246-259)
    repj_refine: bool = False
    repj_iou2d3d_lw: float = 0.1
    repj_pm_lw: float = 10.0
    repj_miou_lw: float = 1.0
    repj_msssim_lw: float = 1.0
    repj_render_res: int = 64       # multi-view render side (W/shrink analog)


@dataclass(frozen=True)
class DetConfig:
    """YOLOv4 detector: input size + train-time augmentation.

    Parity: configs/_base_/yolov4_base.py:18-36 (aug knobs) and
    det/yolov4/datasets/data_loader.py:58-120,230-330 (mosaic + affine +
    HSV pipeline). Defaults follow the reference's yolov4_base values.
    """
    input_size: int = 640
    width_multiple: float = 1.0
    depth_multiple: float = 1.0
    max_objs: int = 16              # padded targets per image (static shape)
    # --- augmentation (train split only) ---
    aug_mosaic: bool = False        # 4-image mosaic (AUG_MOSAIC)
    aug_hsv_prob: float = 1.0       # AUG_HSV_PROB
    hsv_h: float = 0.015            # HSV gains (fractions)
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    rand_rotate_deg: float = 0.0    # random_affine knobs
    rand_translate: float = 0.0
    rand_scale: float = 0.5
    rand_shear: float = 0.0
    rand_hflip: bool = True
    rand_vflip: bool = False


@dataclass(frozen=True)
class DistConfig:
    # mesh axes; data-parallel is the reference-parity axis (SURVEY §2.7),
    # fsdp sharding of params is a new TPU capability
    data_axis: str = "data"
    fsdp_axis: str = "fsdp"
    mesh_shape: tuple[int, ...] = (-1, 1)    # (data, fsdp); -1 = all devices
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class Config:
    exp_name: str = "default"
    output_dir: str = "output"
    seed: int = 0
    model: PoseNetConfig = field(default_factory=PoseNetConfig)
    deepim: DeepIMConfig = field(default_factory=DeepIMConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    data: DataConfig = field(default_factory=DataConfig)
    test: TestConfig = field(default_factory=TestConfig)
    renderer: RendererConfig = field(default_factory=RendererConfig)
    self_sup: SelfSupConfig = field(default_factory=SelfSupConfig)
    det: DetConfig = field(default_factory=DetConfig)
    dist: DistConfig = field(default_factory=DistConfig)
    ckpt_period: int = 5000
    ckpt_max_to_keep: int = 2
    log_period: int = 100
    tensorboard: bool = False       # add a TB scalar writer to the trainer
    vis_period: int = 0             # iters between TB image grids (0 = off)


# ---------------------------------------------------------------------------
# loading + overrides
# ---------------------------------------------------------------------------

def load_config(path: str) -> Config:
    """Import a python config module exporting get_config() -> Config."""
    spec = importlib.util.spec_from_file_location("_user_config", path)
    assert spec is not None and spec.loader is not None, f"cannot load {path}"
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg = mod.get_config()
    assert isinstance(cfg, Config), f"{path}: get_config() must return Config"
    return cfg


def _coerce(val: str, target_type: Any):
    if target_type is bool:
        return val.lower() in ("1", "true", "yes")
    if target_type is int:
        return int(val)
    if target_type is float:
        return float(val)
    if target_type is str:
        return val
    # tuples: comma-separated
    return tuple(v.strip() for v in val.split(","))


def apply_overrides(cfg: Config, opts: list[str]) -> Config:
    """Apply 'a.b.c=value' overrides (the reference's --opts deep-merge,
    core/gdrn_modeling/main_gdrn.py:57-59, without eval())."""
    for opt in opts:
        key, _, raw = opt.partition("=")
        parts = key.split(".")
        cfg = _replace_path(cfg, parts, raw)
    return cfg


def _replace_path(obj, parts: list[str], raw: str):
    name = parts[0]
    fields = {f.name: f for f in dataclasses.fields(obj)}
    assert name in fields, f"unknown config key: {name} on {type(obj).__name__}"
    if len(parts) == 1:
        cur = getattr(obj, name)
        return dataclasses.replace(obj, **{name: _coerce(raw, type(cur))})
    child = _replace_path(getattr(obj, name), parts[1:], raw)
    return dataclasses.replace(obj, **{name: child})
