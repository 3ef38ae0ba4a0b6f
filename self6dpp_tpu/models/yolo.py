"""YOLOv4 detector in Flax (CSP-Darknet53 + SPP + PAN + YOLO heads).

Parity target: det/yolov4/models/yolo.py (yaml-built CSPDarknet with Mish,
Detect head at 3 scales x 3 anchors, `Model.forward(do_loss)`), yolo_loss /
build_targets (:76-141, 220), and NMS (det/yolov4/yolo_utils/utils.py
non_max_suppression). Re-designed: explicit Flax modules instead of the yaml
interpreter; losses are pure functions with static-shape target assignment;
NMS is host-side numpy (test-time only, same as the reference's downstream
usage via detection jsons).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

Array = jax.Array

# default anchors (yolov4-mish.yaml, 3 per scale, strides 8/16/32)
DEFAULT_ANCHORS = (
    ((12, 16), (19, 36), (40, 28)),
    ((36, 75), (76, 55), (72, 146)),
    ((142, 110), (192, 243), (459, 401)),
)


@dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 13
    input_size: int = 640
    depth_multiple: float = 1.0
    width_multiple: float = 1.0
    anchors: tuple = DEFAULT_ANCHORS
    # loss weights (det/yolov4 hyp)
    box_lw: float = 0.05
    obj_lw: float = 1.0
    cls_lw: float = 0.5
    anchor_t: float = 4.0
    conf_thresh: float = 0.001
    iou_thresh: float = 0.65


def mish(x: Array) -> Array:
    return x * jnp.tanh(jax.nn.softplus(x))


class ConvBnMish(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return mish(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnMish(self.features, 1, dtype=self.dtype)(x, train)
        y = ConvBnMish(self.features, 3, dtype=self.dtype)(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.features) else y


class CSPBlock(nn.Module):
    """Cross-stage-partial block (BottleneckCSP)."""
    features: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features // 2
        y1 = ConvBnMish(c_, 1, dtype=self.dtype)(x, train)
        for _ in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, dtype=self.dtype)(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype)(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype)(y)
        y = mish(y)
        return ConvBnMish(self.features, 1, dtype=self.dtype)(y, train)


class SPP(nn.Module):
    features: int
    pools: tuple[int, ...] = (5, 9, 13)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features // 2
        x = ConvBnMish(c_, 1, dtype=self.dtype)(x, train)
        outs = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1), padding="SAME")
            for k in self.pools
        ]
        return ConvBnMish(self.features, 1, dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1), train)


def _up2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), "nearest")


class YOLOv4(nn.Module):
    cfg: YoloConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> list[Array]:
        """x (B, S, S, 3) in [0,1]. Returns raw head outputs per scale:
        [(B, S/8, S/8, 3, 5+nc), (.. /16 ..), (.. /32 ..)]."""
        c = self.cfg
        w = lambda ch: max(int(ch * c.width_multiple), 32)
        d = lambda n: max(int(round(n * c.depth_multiple)), 1)
        CB, CSP = ConvBnMish, CSPBlock

        # backbone (CSP-Darknet53)
        x = CB(w(32), 3, dtype=self.dtype)(x, train)
        x = CB(w(64), 3, 2, dtype=self.dtype)(x, train)
        x = CSP(w(64), d(1), dtype=self.dtype)(x, train)
        x = CB(w(128), 3, 2, dtype=self.dtype)(x, train)
        x = CSP(w(128), d(2), dtype=self.dtype)(x, train)
        x = CB(w(256), 3, 2, dtype=self.dtype)(x, train)
        p3 = CSP(w(256), d(8), dtype=self.dtype)(x, train)          # stride 8
        x = CB(w(512), 3, 2, dtype=self.dtype)(p3, train)
        p4 = CSP(w(512), d(8), dtype=self.dtype)(x, train)          # stride 16
        x = CB(w(1024), 3, 2, dtype=self.dtype)(p4, train)
        x = CSP(w(1024), d(4), dtype=self.dtype)(x, train)
        p5 = SPP(w(1024), dtype=self.dtype)(x, train)               # stride 32

        # PAN neck
        u5 = CB(w(512), 1, dtype=self.dtype)(p5, train)
        x4 = jnp.concatenate([_up2(u5), CB(w(512), 1, dtype=self.dtype)(p4, train)], -1)
        n4 = CSP(w(512), d(2), shortcut=False, dtype=self.dtype)(x4, train)
        u4 = CB(w(256), 1, dtype=self.dtype)(n4, train)
        x3 = jnp.concatenate([_up2(u4), CB(w(256), 1, dtype=self.dtype)(p3, train)], -1)
        n3 = CSP(w(256), d(2), shortcut=False, dtype=self.dtype)(x3, train)

        d4 = jnp.concatenate([CB(w(256), 3, 2, dtype=self.dtype)(n3, train), n4], -1)
        n4b = CSP(w(512), d(2), shortcut=False, dtype=self.dtype)(d4, train)
        d5 = jnp.concatenate([CB(w(512), 3, 2, dtype=self.dtype)(n4b, train), u5], -1)
        n5b = CSP(w(1024), d(2), shortcut=False, dtype=self.dtype)(d5, train)

        no = 5 + c.num_classes
        outs = []
        for feat in (n3, n4b, n5b):
            y = nn.Conv(3 * no, (1, 1), dtype=self.dtype)(feat)
            b, h, ww, _ = y.shape
            outs.append(y.reshape(b, h, ww, 3, no))
        return outs


def decode_predictions(outs: list[Array], cfg: YoloConfig) -> Array:
    """Raw heads -> (B, N, 5+nc) with xywh in pixels, obj/cls as sigmoid
    probs (yolo.py Detect inference path: xy = 2σ-0.5 + grid, wh=(2σ)²·anchor)."""
    res = []
    for si, out in enumerate(outs):
        stride = cfg.input_size // out.shape[1]
        b, h, w, na, no = out.shape
        gy = jnp.arange(h, dtype=out.dtype)[None, :, None, None]
        gx = jnp.arange(w, dtype=out.dtype)[None, None, :, None]
        sig = jax.nn.sigmoid(out)
        anchors = jnp.asarray(cfg.anchors[si], dtype=out.dtype)      # (3,2)
        xy = jnp.stack([
            (sig[..., 0] * 2.0 - 0.5 + gx) * stride,
            (sig[..., 1] * 2.0 - 0.5 + gy) * stride,
        ], axis=-1)
        wh = (sig[..., 2:4] * 2.0) ** 2 * anchors[None, None, None]
        rest = sig[..., 4:]
        res.append(jnp.concatenate([xy, wh, rest], -1).reshape(b, -1, no))
    return jnp.concatenate(res, axis=1)


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def bbox_ciou(box1: Array, box2: Array, eps: float = 1e-7) -> Array:
    """Complete-IoU between xywh boxes (..., 4) (yolo_utils bbox_iou CIoU)."""
    b1x1, b1y1 = box1[..., 0] - box1[..., 2] / 2, box1[..., 1] - box1[..., 3] / 2
    b1x2, b1y2 = box1[..., 0] + box1[..., 2] / 2, box1[..., 1] + box1[..., 3] / 2
    b2x1, b2y1 = box2[..., 0] - box2[..., 2] / 2, box2[..., 1] - box2[..., 3] / 2
    b2x2, b2y2 = box2[..., 0] + box2[..., 2] / 2, box2[..., 1] + box2[..., 3] / 2
    inter = (jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1)).clip(0) * \
            (jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1)).clip(0)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((box1[..., 0] - box2[..., 0]) ** 2 + (box1[..., 1] - box2[..., 1]) ** 2)
    import math
    v = (4 / math.pi ** 2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + jax.lax.stop_gradient(alpha) * v)


def yolo_loss(outs: list[Array], targets: Array, tvalid: Array,
              cfg: YoloConfig) -> dict[str, Array]:
    """Static-shape YOLO loss.

    targets: (B, M, 5) rows [cls, cx, cy, w, h] in pixels; tvalid (B, M).
    Assignment (build_targets parity, vectorized): each target matches
    anchors with wh-ratio < anchor_t at its center cell plus the two
    adjacent cells nearer the center offset.
    """
    from .layers import get_act  # noqa: F401  (parity note only)
    total_box = 0.0
    total_obj = 0.0
    total_cls = 0.0
    balance = (4.0, 1.0, 0.4)

    for si, out in enumerate(outs):
        stride = cfg.input_size // out.shape[1]
        b, h, w, na, no = out.shape
        anchors = jnp.asarray(cfg.anchors[si], dtype=out.dtype) / stride  # grid units
        t_xy = targets[..., 1:3] / stride                       # (B,M,2)
        t_wh = targets[..., 3:5] / stride
        t_cls = targets[..., 0].astype(jnp.int32)

        # anchor match: max(wh/anchor, anchor/wh) < anchor_t
        r = t_wh[:, :, None, :] / anchors[None, None, :, :]      # (B,M,A,2)
        match = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1) < cfg.anchor_t
        match = match & tvalid[:, :, None]

        # cell offsets: center + 2 nearest neighbor cells (g=0.5 rule)
        gxy = t_xy
        offs = [jnp.zeros_like(gxy)]
        fx = gxy[..., 0] % 1.0
        fy = gxy[..., 1] % 1.0
        offs.append(jnp.stack([jnp.where(fx < 0.5, -1.0, 1.0),
                               jnp.zeros_like(fx)], -1))
        offs.append(jnp.stack([jnp.zeros_like(fy),
                               jnp.where(fy < 0.5, -1.0, 1.0)], -1))

        obj_target = jnp.zeros((b, h, w, na), out.dtype)
        tbox = jnp.concatenate([t_xy, t_wh], -1)[:, :, None, :]  # (B,M,1,4)
        aidx = jnp.arange(na)[None, None, :]
        for off in offs:
            # vectorized over anchors: one gather per offset, (B,M,A,...)
            cell = jnp.floor(gxy + off).astype(jnp.int32)        # (B,M,2)
            inb = ((cell[..., 0] >= 0) & (cell[..., 0] < w) &
                   (cell[..., 1] >= 0) & (cell[..., 1] < h))
            sel = match & inb[:, :, None]                         # (B,M,A)
            ci = jnp.clip(cell[..., 0], 0, w - 1)
            cj = jnp.clip(cell[..., 1], 0, h - 1)
            pred = out[jnp.arange(b)[:, None], cj, ci]            # (B,M,A,no)
            sig = jax.nn.sigmoid(pred)
            pxy = sig[..., :2] * 2.0 - 0.5 + cell[:, :, None, :].astype(out.dtype)
            pwh = (sig[..., 2:4] * 2.0) ** 2 * anchors[None, None]
            pbox = jnp.concatenate([pxy, pwh], -1)                # (B,M,A,4)
            ciou = bbox_ciou(pbox, tbox)                          # (B,M,A)
            selm = sel.astype(out.dtype)
            total_box = total_box + (
                (1.0 - ciou) * selm).sum() / jnp.maximum(selm.sum(), 1.0) \
                * balance_weight(si)
            if cfg.num_classes > 1:
                onehot = jax.nn.one_hot(t_cls, cfg.num_classes,
                                        dtype=out.dtype)[:, :, None, :]
                clogit = pred[..., 5:]
                bce = jnp.maximum(clogit, 0) - clogit * onehot + \
                    jnp.log1p(jnp.exp(-jnp.abs(clogit)))
                total_cls = total_cls + (
                    bce.mean(-1) * selm).sum() / jnp.maximum(selm.sum(), 1.0)
            # objectness target = detached iou (gr=1.0)
            iou_d = jax.lax.stop_gradient(jnp.clip(ciou, 0.0, 1.0)) * selm
            obj_target = obj_target.at[
                jnp.arange(b)[:, None, None], cj[:, :, None], ci[:, :, None],
                aidx].max(iou_d)

        ologit = out[..., 4]
        obce = jnp.maximum(ologit, 0) - ologit * obj_target + \
            jnp.log1p(jnp.exp(-jnp.abs(ologit)))
        total_obj = total_obj + obce.mean() * balance[si]

    return {
        "loss_box": total_box * cfg.box_lw,
        "loss_obj": total_obj * cfg.obj_lw,
        "loss_cls": total_cls * cfg.cls_lw,
    }


def balance_weight(si: int) -> float:
    return (4.0, 1.0, 0.4)[si]


# ---------------------------------------------------------------------------
# NMS (host-side, test-time only)
# ---------------------------------------------------------------------------

def non_max_suppression(pred: np.ndarray, conf_thres: float = 0.001,
                        iou_thres: float = 0.65, max_det: int = 100,
                        ) -> list[np.ndarray]:
    """pred (B, N, 5+nc) numpy -> per-image (k, 6) [x1,y1,x2,y2,conf,cls]."""
    out = []
    for p in pred:
        conf = p[:, 4:5] * p[:, 5:]
        cls = conf.argmax(1)
        score = conf.max(1)
        keep = score > conf_thres
        boxes = p[keep, :4]
        score = score[keep]
        cls = cls[keep]
        x1 = boxes[:, 0] - boxes[:, 2] / 2
        y1 = boxes[:, 1] - boxes[:, 3] / 2
        x2 = boxes[:, 0] + boxes[:, 2] / 2
        y2 = boxes[:, 1] + boxes[:, 3] / 2
        xyxy = np.stack([x1, y1, x2, y2], 1)
        # class-offset trick for per-class NMS
        offset = cls[:, None] * 4096.0
        picked = _nms_numpy(xyxy + offset, score, iou_thres)[:max_det]
        out.append(np.concatenate([
            xyxy[picked], score[picked, None], cls[picked, None].astype(np.float32)
        ], axis=1) if len(picked) else np.zeros((0, 6), np.float32))
    return out


def _nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_thres: float):
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[order[1:], 2] - boxes[order[1:], 0]) * \
             (boxes[order[1:], 3] - boxes[order[1:], 1])
        iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
        order = order[1:][iou <= iou_thres]
    return np.asarray(keep, dtype=np.int64)
