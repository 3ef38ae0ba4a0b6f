"""FPN neck (core/gdrn_modeling/models/necks/fpn.py parity; off by default
in every headline reference config, configs/_base_/self6dpp_base.py:53-63).

Standard top-down FPN: 1x1 laterals + nearest upsample + 3x3 smoothing.
Returns pyramid levels finest-first. GDRN uses it via
BackboneConfig.out_indices=(2,3,4) + PoseNetConfig neck='fpn'; the geo head
then consumes the level matching its expected stride.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


class FPN(nn.Module):
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: list[Array]) -> list[Array]:
        """feats: backbone stages finest-first (e.g. strides 8, 16, 32)."""
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway
        for i in range(len(laterals) - 2, -1, -1):
            up = laterals[i + 1]
            n, h, w, c = up.shape
            th, tw = laterals[i].shape[1], laterals[i].shape[2]
            up = jax.image.resize(up, (n, th, tw, c), "nearest")
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"smooth{i}")(l)
            for i, l in enumerate(laterals)
        ]
        return outs
