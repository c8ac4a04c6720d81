r"""Tests for the ADM model family: construction, forward shapes, and numerical
parity of the converted PyTorch weights against the reference implementation
(SURVEY.md §4: "PyTorch-parity golden tests for the ADM port")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sys

from azula_tpu.models.adm import AblatedDenoiser, make_model
from azula_tpu.models.adm.backbone import ADMUNet, timestep_embedding
from azula_tpu.models.adm.convert import convert_state_dict
from azula_tpu.utils.pytree import load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

SMALL = dict(  # noqa: C408
    image_size=32,
    in_channels=3,
    model_channels=32,
    out_channels=6,
    num_res_blocks=1,
    attention_resolutions={2},
    channel_mult=(1, 2),
    num_classes=10,
    num_head_channels=16,
    use_scale_shift_norm=True,
    resblock_updown=True,
)


def test_adm_unet_forward(key):
    unet = ADMUNet(**SMALL, key=key)

    x = jax.random.normal(key, (2, 32, 32, 3))
    t = jnp.asarray([10, 500])
    y = jnp.asarray([1, 7])

    out = unet(x, t, y=y)

    assert out.shape == (2, 32, 32, 6)
    assert jnp.all(jnp.isfinite(out))


def test_make_model_and_denoise(key):
    denoiser = make_model(
        image_size=32,
        num_channels=32,
        num_res_blocks=1,
        channel_mult=[1, 2],
        attention_resolutions=[16],
        num_classes=None,
        num_head_channels=16,
        learn_var=True,
        clip_mean=True,
        key=key,
    )

    x_t = jax.random.normal(key, (2, 32, 32, 3))
    t = jnp.full((2,), 0.5)

    q = denoiser(x_t, t)

    assert q.mean.shape == x_t.shape
    assert jnp.all(jnp.isfinite(q.mean))
    assert jnp.all(q.mean >= -1.0) and jnp.all(q.mean <= 1.0)
    assert jnp.all(q.var > 0)


@pytest.fixture(scope="module")
def reference():
    import types

    # The reference's hub imports optional deps unconditionally
    sys.modules.setdefault("gdown", types.ModuleType("gdown"))

    sys.path.insert(0, "/root/reference")
    try:
        import torch  # noqa: F401
        from azula.plugins.adm._src.unet import UNetModel

        yield UNetModel
    finally:
        sys.path.remove("/root/reference")


VARIANTS = {
    "legacy-order": dict(use_new_attention_order=False),  # noqa: C408
    "new-order": dict(use_new_attention_order=True),  # noqa: C408
    # Additive (non-FiLM) time conditioning + conv up/downsampling + num_heads
    "additive-conv-resample": dict(  # noqa: C408
        use_scale_shift_norm=False,
        resblock_updown=False,
        num_head_channels=-1,
        num_heads=4,
    ),
}


@pytest.mark.parametrize("variant", list(VARIANTS), ids=list(VARIANTS))
def test_torch_parity(reference, variant, key):
    r"""The converted torch weights produce matching outputs (float32), across
    both attention orders and the additive-conditioning / conv-resample paths."""

    import torch

    torch.manual_seed(0)

    cfg = {**SMALL, **VARIANTS[variant]}

    ref = reference(**cfg)  # the constructor kwargs match by name
    ref.eval()

    ours = ADMUNet(**cfg, key=key)
    ours = load_state_dict(ours, convert_state_dict(ours, ref.state_dict()))

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    t = np.asarray([10, 500])
    y = np.asarray([1, 7])

    with torch.no_grad():
        out_ref = ref(torch.as_tensor(x), torch.as_tensor(t), torch.as_tensor(y))

    out_ours = ours(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t),
        y=jnp.asarray(y),
    )

    out_ref = np.transpose(out_ref.numpy(), (0, 2, 3, 1))

    err = np.abs(out_ref - np.asarray(out_ours))

    assert err.max() < 1e-4, err.max()


def test_denoiser_parity(reference, key):
    r"""End-to-end AblatedDenoiser (searchsorted time mapping, preconditioning,
    learned variance) matches the reference wrapper."""

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.adm import AblatedDenoiser as RefDenoiser
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)

    ref_backbone = reference(
        image_size=32,
        in_channels=3,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions={2},
        channel_mult=(1, 2),
        num_classes=10,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
    )

    ref = RefDenoiser(
        ref_backbone, clip_mean=False, learn_var=True, discrete_schedule="cosine"
    )
    ref.eval()

    backbone = ADMUNet(**SMALL, key=key)
    backbone = load_state_dict(
        backbone, convert_state_dict(backbone, ref_backbone.state_dict())
    )

    ours = AblatedDenoiser(
        backbone, clip_mean=False, learn_var=True, discrete_schedule="cosine"
    )

    x = np.random.default_rng(1).normal(size=(2, 3, 32, 32)).astype(np.float32)
    t = np.asarray([0.3, 0.8], dtype=np.float32)
    y = np.asarray([2, 9])

    with torch.no_grad():
        q_ref = ref(torch.as_tensor(x), torch.as_tensor(t), label=torch.as_tensor(y))

    q_ours = ours(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t),
        label=jnp.asarray(y),
    )

    mean_ref = np.transpose(q_ref.mean.numpy(), (0, 2, 3, 1))
    var_ref = np.transpose(q_ref.var.numpy(), (0, 2, 3, 1))

    assert np.abs(mean_ref - np.asarray(q_ours.mean)).max() < 1e-3
    assert np.abs(var_ref - np.asarray(q_ours.var)).max() < 1e-3


def test_timestep_embedding_matches_reference():
    r"""Cos-first sinusoidal embedding matches guided-diffusion's
    (reference `adm/_src/nn.py:90-108`)."""

    t = jnp.asarray([0.0, 1.0, 10.0, 999.0])
    emb = timestep_embedding(t, 128)

    half = 64
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
    args = np.asarray(t)[:, None] * freqs
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)

    # float32 argument rounding at large t gives ~3e-5 vs the float64 oracle
    assert np.allclose(np.asarray(emb), expected.astype(np.float32), atol=1e-4)


@pytest.mark.parametrize("card_name", ["imagenet_64x64_cond", "imagenet_256x256"])
def test_manifest_matches_reference_state_dict(reference, card_name):
    r"""The packaged per-card manifest (generated from the *native* module by
    the record-mode converter) exactly matches the key/shape layout of the
    reference's own vendored `UNetModel` at the card config — a real oracle
    for the manifest contract, not a twin."""

    from azula_tpu.models.utils import check_manifest, load_cards

    import azula_tpu.models.adm  # noqa: F401

    cfg = dict(load_cards("azula_tpu.models.adm")[card_name].config)

    # Reproduce the reference make_model card->UNetModel mapping
    # (`/root/reference/azula/plugins/adm/__init__.py:164-195`)
    image_size = cfg.pop("image_size", 64)
    image_channels = cfg.pop("image_channels", 3)
    learn_var = cfg.pop("learn_var", True)
    attention_resolutions = cfg.pop("attention_resolutions", (32, 16, 8))
    for k in ("clip_mean", "discrete_schedule", "discrete_steps"):
        cfg.pop(k, None)

    model = reference(
        image_size=image_size,
        in_channels=image_channels,
        out_channels=2 * image_channels if learn_var else image_channels,
        model_channels=cfg.pop("num_channels", 128),
        channel_mult=cfg.pop("channel_mult", (1, 2, 3, 4)),
        num_classes=cfg.pop("num_classes", None),
        attention_resolutions={image_size // r for r in attention_resolutions},
        **cfg,
    )

    check_manifest(model.state_dict(), "adm", card_name, "model")
