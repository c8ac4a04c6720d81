r"""Tests for the ELDM (EDM2) family: native magnitude-preserving UNet, twin
parity, pickle conversion, and the latent AutoEncoder wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.eldm import AutoEncoder, ElucidatedLatentDenoiser
from azula_tpu.models.eldm.backbone import EDM2Precond, EDM2UNet
from azula_tpu.models.eldm.convert import build_from_pickle, convert_eldm_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

SMALL = dict(  # noqa: C408
    img_resolution=16,
    img_channels=4,
    label_dim=10,
    model_channels=16,
    channel_mult=(1, 2),
    num_blocks=1,
    attn_resolutions=(8,),
)


def test_edm2_unet_forward(key):
    unet = EDM2UNet(**SMALL, key=key)

    x = jax.random.normal(key, (2, 16, 16, 4))
    label = jax.nn.one_hot(jnp.asarray([1, 5]), 10)

    out = unet(x, jnp.asarray([0.1, -0.3]), class_labels=label)

    assert out.shape == x.shape
    assert jnp.all(jnp.isfinite(out))


@pytest.mark.parametrize("cond", [True, False], ids=["cond", "uncond"])
def test_twin_parity(cond, key):
    import torch

    from torch_twins import edm2_unet as twin_mod

    torch.manual_seed(0)

    cfg = dict(SMALL)
    if not cond:
        cfg["label_dim"] = 0

    twin = twin_mod.Precond(twin_mod.UNet(**cfg), label_dim=cfg["label_dim"])
    twin.eval()

    def make():
        unet = EDM2UNet(**cfg, key=jax.random.key(0))
        return EDM2Precond(unet, label_dim=cfg["label_dim"])

    ours = filter_eval_shape(make)
    ours = load_state_dict(ours, convert_eldm_state_dict(ours, twin.state_dict()))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    sigma = np.asarray([0.5, 7.0], dtype=np.float32)
    label = np.eye(10, dtype=np.float32)[[2, 9]] if cond else None

    with torch.no_grad():
        theirs = twin(
            torch.as_tensor(x),
            torch.as_tensor(sigma),
            class_labels=None if label is None else torch.as_tensor(label),
        ).numpy()

    out = ours(
        jnp.asarray(np.moveaxis(x, 1, -1)),
        jnp.asarray(sigma),
        class_labels=None if label is None else jnp.asarray(label),
    )
    out = np.moveaxis(np.asarray(out), -1, 1)

    assert np.allclose(out, theirs, atol=1e-4), np.abs(out - theirs).max()


def test_pickle_roundtrip(key, tmp_path):
    r"""Persistence-format edm2 pickle (with an encoder carrying latent
    shift/scale) -> native construction -> forward parity."""

    import torch

    from torch_twins import edm2_unet as twin_mod
    from torch_twins.edm_unet import fake_nvlabs_pickle

    torch.manual_seed(0)

    twin = twin_mod.Precond(twin_mod.UNet(**SMALL), label_dim=SMALL["label_dim"])
    twin.eval()

    class Encoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("bias", torch.full((4,), 0.25))
            self.register_buffer("scale", torch.full((4,), 2.0))

    path = tmp_path / "fake-edm2.pkl"
    args = (SMALL["img_resolution"], SMALL["img_channels"], SMALL["label_dim"])
    kwargs = {k: v for k, v in SMALL.items()
              if k not in ("img_resolution", "img_channels", "label_dim")}

    # edm2 pickles use {'ema', 'encoder'}; extend the edm fake with an encoder
    import pickle
    import sys
    import types

    from torch_twins.edm_unet import _stubify

    created = []
    for name in ("torch_utils", "torch_utils.persistence"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            created.append(name)
    sys.modules["torch_utils"].persistence = sys.modules["torch_utils.persistence"]

    def _reconstruct_persistent_obj(meta):
        return meta

    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    sys.modules["torch_utils.persistence"]._reconstruct_persistent_obj = (
        _reconstruct_persistent_obj
    )

    try:
        ema = _stubify(twin, class_name="Precond", init_kwargs=dict(kwargs))
        ema.meta["state"]["_init_args"] = args
        ema.meta["state"]["_init_kwargs"] = dict(kwargs)
        ema.meta["state"]["_modules"]["unet"] = _stubify(twin.unet)
        enc = _stubify(Encoder(), class_name="StabilityVAEEncoder")
        with open(path, "wb") as f:
            pickle.dump({"ema": ema, "encoder": enc}, f)
    finally:
        for name in created:
            sys.modules.pop(name, None)

    ours, shift, scale = build_from_pickle(path)

    assert np.allclose(shift, 0.25) and np.allclose(scale, 2.0)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    sigma = np.asarray([1.0, 3.0], dtype=np.float32)

    with torch.no_grad():
        theirs = twin(torch.as_tensor(x), torch.as_tensor(sigma)).numpy()

    out = ours(jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(sigma))
    out = np.moveaxis(np.asarray(out), -1, 1)

    assert np.allclose(out, theirs, atol=1e-4), np.abs(out - theirs).max()


def test_latent_denoiser_and_autoencoder(key):
    r"""The wrapper composes with the native EDM2 backbone and the native VAE."""

    from azula_tpu.models.autoencoder import AutoencoderKL

    k1, k2, k3 = jax.random.split(key, 3)

    unet = EDM2UNet(**{**SMALL, "label_dim": 0}, key=k1)
    denoiser = ElucidatedLatentDenoiser(backbone=EDM2Precond(unet))

    z_t = jax.random.normal(k2, (2, 16, 16, 4))
    q = denoiser(z_t, jnp.full((2,), 0.5))

    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    vae = AutoencoderKL(block_out_channels=(16, 32), layers_per_block=1, key=k3)
    ae = AutoEncoder(vae=vae, shift=jnp.zeros(4), scale=jnp.ones(4))

    x = jax.random.uniform(k2, (1, 32, 32, 3))
    z = ae.encode(x, k3)
    y = ae.decode(z)

    assert z.shape == (1, 16, 16, 4)
    assert y.shape == x.shape
