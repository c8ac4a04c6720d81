r"""Tests for the EDM model family: native SongUNet/DhariwalUNet forwards,
twin parity (golden random weights), and the full pickle-extraction +
conversion path on a persistence-format checkpoint built without the NVlabs
source tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.edm import ElucidatedDenoiser
from azula_tpu.models.edm.backbone import (
    DhariwalUNet,
    EDMPrecond,
    SongUNet,
    VEPrecond,
)
from azula_tpu.models.edm.convert import (
    build_from_pickle,
    convert_edm_state_dict,
    load_nvlabs_pickle,
    stub_state_dict,
)
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

SONG_SMALL = dict(  # noqa: C408
    img_resolution=16,
    in_channels=3,
    out_channels=3,
    model_channels=16,
    channel_mult=(1, 2),
    channel_mult_emb=2,
    num_blocks=1,
    attn_resolutions=(8,),
)

DHARIWAL_SMALL = dict(  # noqa: C408
    img_resolution=16,
    in_channels=3,
    out_channels=3,
    label_dim=10,
    model_channels=16,
    channel_mult=(1, 2),
    channel_mult_emb=2,
    num_blocks=1,
    attn_resolutions=(8,),
)


def test_song_unet_forward(key):
    unet = SongUNet(**SONG_SMALL, key=key)

    x = jax.random.normal(key, (2, 16, 16, 3))
    sigma = jnp.asarray([0.1, 1.0])

    out = unet(x, jnp.log(sigma))

    assert out.shape == x.shape
    assert jnp.all(jnp.isfinite(out))


SONG_VARIANTS = {
    "ddpmpp": dict(  # noqa: C408
        embedding_type="positional",
        encoder_type="standard",
        resample_filter=(1, 1),
        channel_mult_noise=1,
    ),
    "ncsnpp": dict(  # noqa: C408
        embedding_type="fourier",
        encoder_type="residual",
        resample_filter=(1, 3, 3, 1),
        channel_mult_noise=2,
    ),
    "skip-encoder": dict(  # noqa: C408
        encoder_type="skip",
        decoder_type="skip",
    ),
    "conditional": dict(label_dim=10),  # noqa: C408
}


@pytest.mark.parametrize("variant", list(SONG_VARIANTS), ids=list(SONG_VARIANTS))
def test_song_twin_parity(variant, key):
    r"""The converted twin weights produce matching outputs across DDPM++,
    NCSN++ (FIR filters + residual encoder), skip, and conditional variants."""

    import torch

    from torch_twins import edm_unet as twin_mod

    torch.manual_seed(0)

    cfg = {**SONG_SMALL, **SONG_VARIANTS[variant]}

    twin = twin_mod.SongUNet(**cfg)
    twin.eval()

    ours = filter_eval_shape(SongUNet, **cfg, key=key)
    ours = load_state_dict(ours, convert_edm_state_dict(ours, twin.state_dict()))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.asarray([-1.0, 0.5], dtype=np.float32)
    label = None
    label_j = None
    if cfg.get("label_dim"):
        label = np.eye(10, dtype=np.float32)[[3, 7]]
        label_j = jnp.asarray(label)

    with torch.no_grad():
        theirs = twin(
            torch.as_tensor(x),
            torch.as_tensor(t),
            class_labels=None if label is None else torch.as_tensor(label),
        ).numpy()

    out = ours(jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t), class_labels=label_j)
    out = np.moveaxis(np.asarray(out), -1, 1)

    assert np.allclose(out, theirs, atol=1e-4), np.abs(out - theirs).max()


def test_dhariwal_twin_parity(key):
    import torch

    from torch_twins import edm_unet as twin_mod

    torch.manual_seed(0)

    twin = twin_mod.DhariwalUNet(**DHARIWAL_SMALL)
    twin.eval()

    ours = filter_eval_shape(DhariwalUNet, **DHARIWAL_SMALL, key=key)
    ours = load_state_dict(ours, convert_edm_state_dict(ours, twin.state_dict()))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.asarray([-1.0, 0.5], dtype=np.float32)
    label = np.eye(10, dtype=np.float32)[[3, 7]]

    with torch.no_grad():
        theirs = twin(
            torch.as_tensor(x), torch.as_tensor(t), class_labels=torch.as_tensor(label)
        ).numpy()

    out = ours(
        jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t), class_labels=jnp.asarray(label)
    )
    out = np.moveaxis(np.asarray(out), -1, 1)

    assert np.allclose(out, theirs, atol=1e-4), np.abs(out - theirs).max()


@pytest.mark.parametrize("precond", ["VEPrecond", "EDMPrecond"])
def test_pickle_roundtrip(precond, key, tmp_path):
    r"""End-to-end: persistence-format pickle -> stub extraction -> native
    construction from the pickle's own init kwargs -> forward parity with the
    torch twin precond."""

    import torch

    from torch_twins import edm_unet as twin_mod

    torch.manual_seed(0)

    cfg = {**SONG_SMALL, **SONG_VARIANTS["ncsnpp"]}

    model = twin_mod.SongUNet(**cfg)
    twin = (twin_mod.VEPrecond if precond == "VEPrecond" else twin_mod.EDMPrecond)(model)
    twin.eval()

    path = tmp_path / "fake-edm.pkl"
    args = (cfg["img_resolution"], cfg["in_channels"], cfg["out_channels"])
    kwargs = {k: v for k, v in cfg.items() if k not in ("img_resolution", "in_channels", "out_channels")}
    twin_mod.fake_nvlabs_pickle(path, twin, args, kwargs)

    # extraction
    content = load_nvlabs_pickle(path)
    assert content["ema"].class_name == precond
    sd = stub_state_dict(content["ema"])
    assert "model.enc.16x16_conv.weight" in sd

    # native construction + conversion
    ours = build_from_pickle(path)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    sigma = np.asarray([0.5, 10.0], dtype=np.float32)

    with torch.no_grad():
        theirs = twin(torch.as_tensor(x), torch.as_tensor(sigma)).numpy()

    out = ours(jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(sigma))
    out = np.moveaxis(np.asarray(out), -1, 1)

    assert np.allclose(out, theirs, atol=1e-4), np.abs(out - theirs).max()


def test_elucidated_denoiser_native(key):
    r"""The denoiser wrapper composes with the native precond backbone and a
    sampler-ready schedule."""

    unet = SongUNet(**SONG_SMALL, key=key)
    denoiser = ElucidatedDenoiser(backbone=VEPrecond(unet))

    x_t = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.full((2,), 0.5)

    q = denoiser(x_t, t)

    assert q.mean.shape == x_t.shape
    assert jnp.all(jnp.isfinite(q.mean))


def test_conditional_precond_zero_labels(key):
    r"""Conditional backbones called without labels get zero one-hots (the
    label embedding has a bias), matching NVlabs Precond.forward."""

    cfg = {**SONG_SMALL, "label_dim": 10}
    unet = SongUNet(**cfg, key=key)
    precond = EDMPrecond(unet)

    x = jax.random.normal(key, (2, 16, 16, 3))

    out_none = precond(x, jnp.asarray(1.0))
    out_zero = precond(x, jnp.asarray(1.0), class_labels=jnp.zeros((2, 10)))

    assert np.allclose(np.asarray(out_none), np.asarray(out_zero))
