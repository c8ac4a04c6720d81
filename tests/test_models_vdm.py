r"""Tests for the VDM model family: declarative specs reproduce the reference
vendored architectures (state-dict isomorphism) and converted weights give
matching outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sys
import types

from azula_tpu.models.vdm import VelocityDenoiser, make_model
from azula_tpu.models.vdm.backbone import SPECS, VDMUNet
from azula_tpu.models.vdm.convert import convert_state_dict
from azula_tpu.utils.pytree import load_state_dict, state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)


@pytest.fixture(scope="module")
def reference_models():
    sys.modules.setdefault("gdown", types.ModuleType("gdown"))

    # The reference's vendored utils import optional image/IO deps
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tv_t
        tv_t.functional = tv_f
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.transforms.functional"] = tv_f
    if "requests" not in sys.modules:
        try:
            import requests  # noqa: F401
        except ImportError:
            sys.modules["requests"] = types.ModuleType("requests")

    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.vdm._src import models

        yield models.models
    finally:
        sys.path.remove("/root/reference")


@pytest.mark.parametrize("name", ["danbooru_128", "imagenet_128", "wikiart_128", "wikiart_256", "yfcc_1", "yfcc_2"])
def test_state_dict_isomorphism(reference_models, name, key):
    r"""Our declaratively built net has exactly the reference's parameter paths
    and (layout-transposed) shapes."""

    def rename(k, v):
        if k.endswith(".weight") and v.ndim == 1:
            return k[: -len(".weight")] + ".scale"
        return k

    ref = reference_models[name]()
    ref_sd = {rename(k, v): tuple(v.shape) for k, v in ref.state_dict().items()}

    ours = VDMUNet(SPECS[name], key=key)
    our_sd = {k: v.shape for k, v in state_dict(ours).items()}

    # timestep_embed.weight + net.** paths must match exactly
    assert set(our_sd) == set(ref_sd), (
        sorted(set(ref_sd) - set(our_sd))[:5],
        sorted(set(our_sd) - set(ref_sd))[:5],
    )

    for k, shape in ref_sd.items():
        if len(shape) == 4:  # conv: (out, in, kh, kw) -> (kh, kw, in, out)
            expected = (shape[2], shape[3], shape[1], shape[0])
        else:
            expected = shape
        assert our_sd[k] == expected, (k, our_sd[k], expected)

    # Real-oracle manifest validation: the reference torch model's state dict
    # IS the published checkpoint layout, so the packaged manifest must accept
    # it exactly (`load_model` diffs against it before converting).
    from azula_tpu.models.utils import check_manifest

    card = {
        "danbooru_128": "danbooru_128x128",
        "imagenet_128": "imagenet_128x128",
        "wikiart_128": "wikiart_128x128",
        "wikiart_256": "wikiart_256x256",
        "yfcc_1": "yfcc_512x512",
        "yfcc_2": "yfcc_512x512_large",
    }[name]
    check_manifest(ref.state_dict(), "vdm", card, "model")

    del ref


def test_forward_parity(reference_models, key):
    r"""Converted weights produce matching outputs (imagenet_128 at reduced
    spatial size — the network is fully convolutional)."""

    import torch

    torch.manual_seed(0)

    ref = reference_models["imagenet_128"]()
    ref.eval()

    ours = VDMUNet(SPECS["imagenet_128"], key=key)
    ours = load_state_dict(ours, convert_state_dict(ref.state_dict()))

    x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    t = np.asarray([0.4], dtype=np.float32)

    with torch.no_grad():
        out_ref = ref(torch.as_tensor(x), torch.as_tensor(t)).numpy()

    out_ours = ours(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t))

    out_ref = np.transpose(out_ref, (0, 2, 3, 1))
    err = np.abs(out_ref - np.asarray(out_ours))

    assert err.max() < 5e-4, err.max()

    del ref, ours


def test_velocity_denoiser_runs(key):
    r"""Small synthetic spec: denoiser wrapper end-to-end."""

    from azula_tpu.models.vdm.backbone import VDMSpec

    spec = VDMSpec(
        cs=(8, 16, 32),
        blocks=1, inner=2, attn=(2,), head_dim=8,
        final_act=False, t_input="log_snr", up="nearest", std=0.2,
    )

    denoiser = VelocityDenoiser(VDMUNet(spec, key=key))

    x_t = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.full((2,), 0.5)

    q = denoiser(x_t, t)

    assert q.mean.shape == x_t.shape
    assert jnp.all(jnp.isfinite(q.mean))


def test_make_model_names():
    for name in SPECS:
        assert name in SPECS

    # Cards map onto known specs
    from azula_tpu.models.utils import load_cards

    cards = load_cards("azula_tpu.models.vdm")

    for card in cards.values():
        assert card.config["model"] in SPECS
