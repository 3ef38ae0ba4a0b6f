"""Pure-functional compute ops (public API).

Geometry / pose:
    geometry           rotations (quat/rot6d/axangle), allo<->ego, transforms
    pose_decode        SITE centroid-z decoding, DeepIM delta-pose updates
    pose_errors        ADD/ADD-S/re/te/proj/vsd/mssd/mspd + recall tables
    zoom               K-crop, bilinear crop-resize, pose-conditioned boxes

Rendering:
    rasterizer         ONE differentiable tile-binned rasterizer
                       (hard + soft modes; XLA and Pallas backends)
    raster_pallas      the fused TPU fine-stage kernel (analytic VJP)

Replacements for the reference's CUDA extensions:
    chamfer            bidirectional NN distance (MXU pairwise form)
    flow               depth-warp optical-flow GT
    fps                farthest-point sampling (C++/OpenMP via ctypes)

Image metrics:
    ssim               SSIM / MS-SSIM
    color              RGB<->LAB/HSV/gray + LAB chroma loss
"""

from . import (chamfer, color, flow, fps, geometry, pose_decode, pose_errors,
               rasterizer, ssim, zoom)

__all__ = ["chamfer", "color", "flow", "fps", "geometry", "pose_decode",
           "pose_errors", "rasterizer", "ssim", "zoom"]
