r"""Tests for the SD model family: construction, forward shapes, converter
key-set isomorphism, and numerical parity against a hand-built PyTorch twin of
the diffusers `UNet2DConditionModel` (golden-random-weights protocol, see
`tests/torch_twins/__init__.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.sd import StableDenoiser, make_backbone
from azula_tpu.models.sd.backbone import SDUNet
from azula_tpu.models.sd.convert import convert_unet_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

SMALL = dict(  # noqa: C408
    in_channels=4,
    out_channels=4,
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=24,
    attention_head_dim=2,
    cross_attention_levels=(True, False),
)


def test_sd_unet_forward(key):
    unet = SDUNet(**SMALL, key=key)

    z = jax.random.normal(key, (2, 16, 16, 4))
    t = jnp.asarray([10, 500])
    ctx = jax.random.normal(key, (2, 7, 24))

    out = unet(z, t, ctx)

    assert out.shape == (2, 16, 16, 4)
    assert jnp.all(jnp.isfinite(out))


def test_stable_denoiser(key):
    unet = SDUNet(**SMALL, key=key)
    denoiser = StableDenoiser(unet)

    z_t = jax.random.normal(key, (2, 16, 16, 4))
    t = jnp.full((2,), 0.4)
    ctx = jax.random.normal(key, (1, 7, 24))

    q = denoiser(z_t, t, prompt_embeds=ctx)

    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))


VARIANTS = {
    "sd1-conv-proj": dict(use_linear_projection=False),  # noqa: C408
    "sd2-linear-proj": dict(use_linear_projection=True),  # noqa: C408
}


@pytest.mark.parametrize("variant", list(VARIANTS), ids=list(VARIANTS))
def test_twin_parity(variant, key):
    r"""The converted twin weights produce matching outputs (float32), for both
    the SD1 (1x1-conv) and SD2 (linear) transformer projection layouts."""

    import torch

    from torch_twins.sd_unet import UNet2DConditionTwin

    torch.manual_seed(0)

    cfg = {**SMALL, **VARIANTS[variant]}

    twin = UNet2DConditionTwin(**cfg)
    twin.eval()

    ours = filter_eval_shape(SDUNet, **cfg, key=key)
    ours = load_state_dict(ours, convert_unet_state_dict(ours, twin.state_dict()))

    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    t = np.asarray([10.0, 500.0], dtype=np.float32)
    ctx = rng.normal(size=(2, 7, 24)).astype(np.float32)

    with torch.no_grad():
        theirs = twin(
            torch.as_tensor(z), torch.as_tensor(t), torch.as_tensor(ctx)
        ).numpy()

    out = ours(
        jnp.asarray(np.moveaxis(z, 1, -1)), jnp.asarray(t), jnp.asarray(ctx)
    )
    out = np.moveaxis(np.asarray(out), -1, 1)

    assert np.allclose(out, theirs, atol=1e-4), np.abs(out - theirs).max()


@pytest.mark.parametrize("name", ["sd_1.5", "sd_2"])
def test_full_size_construct(name):
    r"""The real checkpoint architectures construct abstractly with the
    published parameter counts (SD 1.x UNet: 859,520,964; SD 2: 865,910,724)."""

    expected = {"sd_1.5": 859_520_964, "sd_2": 865_910_724}

    unet = filter_eval_shape(make_backbone, name)

    n = sum(
        int(np.prod(leaf.shape))
        for leaf in jax.tree.leaves(unet)
        if hasattr(leaf, "shape")
    )

    assert n == expected[name], f"{name}: {n:,} params"
