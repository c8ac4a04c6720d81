r"""Tests for the Flux family: native MMDiT forward, twin parity (golden
random weights), and composition with the verified FluxDenoiser wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.flux import FluxDenoiser
from azula_tpu.models.flux.backbone import FluxTransformer
from azula_tpu.models.flux.convert import convert_flux_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

SMALL = dict(  # noqa: C408
    in_channels=16,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=24,
    num_attention_heads=2,
    joint_attention_dim=32,
    pooled_projection_dim=20,
    axes_dims_rope=(8, 8, 8),
)


def _ids(H, W, Lt):
    z = np.zeros(1)
    grid = np.stack(np.meshgrid(z, np.arange(H), np.arange(W), indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.float32), np.zeros((Lt, 3), dtype=np.float32)


def test_flux_transformer_forward(key):
    model = FluxTransformer(**SMALL, key=key)

    B, H, W, Lt = 2, 4, 4, 6
    img_ids, txt_ids = _ids(H, W, Lt)

    out = model(
        hidden_states=jax.random.normal(key, (B, H * W, 16)),
        timestep=jnp.asarray([0.3, 0.9]),
        encoder_hidden_states=jax.random.normal(key, (B, Lt, 32)),
        pooled_projections=jax.random.normal(key, (B, 20)),
        img_ids=jnp.asarray(img_ids),
        txt_ids=jnp.asarray(txt_ids),
        guidance=jnp.asarray([4.0, 4.0]),
    )

    assert out.shape == (B, H * W, 16)
    assert jnp.all(jnp.isfinite(out))


@pytest.mark.parametrize("guidance_embeds", [True, False], ids=["dev", "schnell"])
def test_twin_parity(guidance_embeds, key):
    import torch

    from torch_twins.flux_mmdit import FluxTransformerTwin

    torch.manual_seed(0)

    cfg = {**SMALL, "guidance_embeds": guidance_embeds}

    twin = FluxTransformerTwin(**cfg)
    twin.eval()

    ours = filter_eval_shape(FluxTransformer, **cfg, key=key)
    ours = load_state_dict(ours, convert_flux_state_dict(ours, twin.state_dict()))

    rng = np.random.default_rng(0)
    B, H, W, Lt = 2, 4, 4, 6
    img_ids, txt_ids = _ids(H, W, Lt)

    z = rng.normal(size=(B, H * W, 16)).astype(np.float32)
    t = np.asarray([0.3, 0.9], dtype=np.float32)
    t5 = rng.normal(size=(B, Lt, 32)).astype(np.float32)
    clip = rng.normal(size=(B, 20)).astype(np.float32)
    g = np.asarray([4.0, 2.0], dtype=np.float32) if guidance_embeds else None

    with torch.no_grad():
        theirs = twin(
            torch.as_tensor(z),
            torch.as_tensor(t),
            torch.as_tensor(t5),
            torch.as_tensor(clip),
            torch.as_tensor(img_ids),
            torch.as_tensor(txt_ids),
            guidance=None if g is None else torch.as_tensor(g),
        ).numpy()

    out = ours(
        hidden_states=jnp.asarray(z),
        timestep=jnp.asarray(t),
        encoder_hidden_states=jnp.asarray(t5),
        pooled_projections=jnp.asarray(clip),
        img_ids=jnp.asarray(img_ids),
        txt_ids=jnp.asarray(txt_ids),
        guidance=None if g is None else jnp.asarray(g),
    )

    assert np.allclose(np.asarray(out), theirs, atol=1e-4), np.abs(np.asarray(out) - theirs).max()


def test_flux_denoiser_native(key):
    r"""The verified FluxDenoiser wrapper composes with the native backbone."""

    model = FluxTransformer(**SMALL, key=key)
    denoiser = FluxDenoiser(backbone=model)

    z_t = jax.random.normal(key, (2, 4, 4, 16))
    t = jnp.full((2,), 0.5)
    clip = jax.random.normal(key, (2, 20))
    t5 = jax.random.normal(key, (1, 6, 32))

    q = denoiser(z_t, t, prompt_clip=clip, prompt_t5=t5)

    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))


def test_full_size_construct():
    r"""The real FLUX.1-dev architecture constructs abstractly with the
    published parameter count (~11.9B)."""

    model = filter_eval_shape(FluxTransformer, key=jax.random.key(0))

    n = sum(
        int(np.prod(leaf.shape))
        for leaf in jax.tree.leaves(model)
        if hasattr(leaf, "shape")
    )

    assert n == 11_901_408_320, f"{n:,} params"
