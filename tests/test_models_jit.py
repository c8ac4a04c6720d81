r"""Tests for the JiT model family: forward shapes and converted-weight parity
against the reference vendored implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import os
import pytest
import sys
import types

from azula_tpu.models.jit import JITDenoiser, make_model
from azula_tpu.models.jit.backbone import JIT_CONFIGS, JiT
from azula_tpu.models.jit.convert import convert_state_dict
from azula_tpu.utils.pytree import load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

SMALL = dict(  # noqa: C408
    input_size=64,
    patch_size=16,
    hidden_size=64,
    depth=3,
    num_heads=4,
    num_classes=10,
    bottleneck_dim=16,
    in_context_len=4,
    in_context_start=1,
)


def test_jit_forward(key):
    model = JiT(**SMALL, key=key)

    x = jax.random.normal(key, (2, 64, 64, 3))
    t = jnp.asarray([0.2, 0.9])
    y = jnp.asarray([1, 7])

    out = model(x, t, y)

    assert out.shape == (2, 64, 64, 3)
    assert jnp.all(jnp.isfinite(out))


def test_jit_denoiser(key):
    denoiser = JITDenoiser(JiT(**SMALL, key=key), num_classes=10)

    x_t = jax.random.normal(key, (2, 64, 64, 3))
    t = jnp.full((2,), 0.5)

    # Null label defaults to num_classes
    q = denoiser(x_t, t)
    assert q.mean.shape == x_t.shape

    q = denoiser(x_t, t, label=jnp.asarray([0, 3]))
    assert jnp.all(jnp.isfinite(q.mean))


def test_configs():
    assert set(JIT_CONFIGS) == {
        "JiT-B/16", "JiT-B/32", "JiT-L/16", "JiT-L/32", "JiT-H/16", "JiT-H/32"
    }


@pytest.fixture(scope="module")
def reference_jit():
    os.environ["TORCHDYNAMO_DISABLE"] = "1"
    sys.modules.setdefault("gdown", types.ModuleType("gdown"))
    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.jit._src.model import JiT as RefJiT

        yield RefJiT
    finally:
        sys.path.remove("/root/reference")


def test_torch_parity(reference_jit, key):
    import torch

    torch.manual_seed(0)

    ref = reference_jit(**SMALL)
    ref.eval()

    ours = JiT(**SMALL, key=key)
    ours = load_state_dict(ours, convert_state_dict(ours, ref.state_dict()))

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    t = np.asarray([0.25, 0.75], dtype=np.float32)
    y = np.asarray([1, 9])

    with torch.no_grad():
        out_ref = ref(torch.as_tensor(x), torch.as_tensor(t), torch.as_tensor(y))

    out_ours = ours(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t),
        jnp.asarray(y),
    )

    out_ref = np.transpose(out_ref.numpy(), (0, 2, 3, 1))
    err = np.abs(out_ref - np.asarray(out_ours))

    assert err.max() < 1e-4, err.max()


def test_card_manifests_accept_reference_layout(reference_jit):
    r"""Real-oracle manifest validation: the reference `JiT_models[...]` state
    dict at each card's full config IS the published checkpoint layout (after
    the `net.` strip `load_model` applies, reference `jit/__init__.py:138`),
    so the packaged manifest must accept it exactly. Built on torch's meta
    device — shapes only, no multi-GB allocation."""

    import torch

    from azula_tpu.models.utils import check_manifest, load_cards

    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.jit._src.model import JiT_models
    finally:
        sys.path.remove("/root/reference")

    for card, spec in load_cards("azula_tpu.models.jit").items():
        with torch.device("meta"):
            ref = JiT_models[spec.config["model"]]()

        check_manifest(ref.state_dict(), "jit", card, "model")
