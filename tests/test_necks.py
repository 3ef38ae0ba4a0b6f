"""FPN neck tests."""

import numpy as np
import jax
import jax.numpy as jnp

from self6dpp_tpu.models.necks import FPN


def test_fpn_shapes_and_fusion():
    feats = [jnp.ones((2, 32, 32, 64)), jnp.ones((2, 16, 16, 128)),
             jnp.ones((2, 8, 8, 256))]
    fpn = FPN(out_channels=32)
    vars_ = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(vars_, feats)
    assert [o.shape for o in outs] == [(2, 32, 32, 32), (2, 16, 16, 32),
                                       (2, 8, 8, 32)]
    # top-down information flows: perturbing the coarsest input changes P2
    feats2 = [feats[0], feats[1], feats[2] + 1.0]
    outs2 = fpn.apply(vars_, feats2)
    assert float(jnp.abs(outs2[0] - outs[0]).max()) > 0
