r"""Tests for the Sana family: native linear-attention DiT forward, twin
parity (golden random weights), and composition with the verified SanaDenoiser
wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.sana import SanaDenoiser
from azula_tpu.models.sana.backbone import SanaTransformer
from azula_tpu.models.sana.convert import convert_sana_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

SMALL = dict(  # noqa: C408
    in_channels=8,
    out_channels=8,
    num_attention_heads=4,
    attention_head_dim=8,
    num_cross_attention_heads=2,
    cross_attention_head_dim=16,
    caption_channels=24,
    num_layers=2,
    patch_size=1,
    mlp_ratio=2.5,
)


def test_sana_transformer_forward(key):
    model = SanaTransformer(**SMALL, key=key)

    out = model(
        hidden_states=jax.random.normal(key, (2, 8, 8, 8)),
        timestep=jnp.asarray([300.0, 800.0]),
        encoder_hidden_states=jax.random.normal(key, (2, 6, 24)),
        encoder_attention_mask=jnp.ones((2, 6)),
    )

    assert out.shape == (2, 8, 8, 8)
    assert jnp.all(jnp.isfinite(out))


@pytest.mark.parametrize("patch", [1, 2], ids=["p1", "p2"])
@pytest.mark.parametrize("masked", [True, False], ids=["masked", "unmasked"])
@pytest.mark.parametrize("qk_norm", [False, True], ids=["sana1", "sana1.5"])
def test_twin_parity(patch, masked, qk_norm, key):
    import torch

    from torch_twins.sana_dit import SanaTransformerTwin

    torch.manual_seed(0)

    cfg = {**SMALL, "patch_size": patch, "qk_norm": qk_norm}

    twin = SanaTransformerTwin(**cfg)
    twin.eval()

    ours = filter_eval_shape(SanaTransformer, **cfg, key=key)
    ours = load_state_dict(ours, convert_sana_state_dict(ours, twin.state_dict()))

    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
    t = np.asarray([300.0, 800.0], dtype=np.float32)
    ctx = rng.normal(size=(2, 6, 24)).astype(np.float32)
    mask = None
    if masked:
        mask = np.ones((2, 6), dtype=np.float32)
        mask[0, 4:] = 0.0

    with torch.no_grad():
        theirs = twin(
            torch.as_tensor(np.moveaxis(z, -1, 1)),
            torch.as_tensor(t),
            torch.as_tensor(ctx),
            None if mask is None else torch.as_tensor(mask),
        ).numpy()

    out = ours(
        hidden_states=jnp.asarray(z),
        timestep=jnp.asarray(t),
        encoder_hidden_states=jnp.asarray(ctx),
        encoder_attention_mask=None if mask is None else jnp.asarray(mask),
    )
    out = np.moveaxis(np.asarray(out), -1, 1)

    assert np.allclose(out, theirs, atol=1e-4), np.abs(out - theirs).max()


def test_sana_denoiser_native(key):
    model = SanaTransformer(**SMALL, key=key)
    denoiser = SanaDenoiser(backbone=model)

    z_t = jax.random.normal(key, (2, 8, 8, 8))
    t = jnp.full((2,), 0.5)
    ctx = jax.random.normal(key, (1, 6, 24))
    mask = jnp.ones((1, 6))

    q = denoiser(z_t, t, prompt_embeds=ctx, prompt_mask=mask)

    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))


def test_full_size_construct():
    r"""The Sana 1.6B architecture constructs abstractly at the published
    scale (~1.6B parameters)."""

    model = filter_eval_shape(SanaTransformer, key=jax.random.key(0))

    n = sum(
        int(np.prod(leaf.shape))
        for leaf in jax.tree.leaves(model)
        if hasattr(leaf, "shape")
    )

    assert 1.5e9 < n < 1.75e9, f"{n:,} params"
