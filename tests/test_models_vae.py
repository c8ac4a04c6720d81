r"""Tests for the native AutoencoderKL: shapes, round-trip, converter key-set
isomorphism, and parity against the PyTorch twin (golden random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.autoencoder import AutoencoderKL, convert_vae_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

SMALL = dict(  # noqa: C408
    in_channels=3,
    latent_channels=4,
    block_out_channels=(32, 64),
    layers_per_block=1,
)


def test_vae_shapes(key):
    vae = AutoencoderKL(**SMALL, key=key)

    x = jax.random.normal(key, (2, 32, 32, 3))

    mean, std = vae.encode(x)

    assert mean.shape == (2, 16, 16, 4)
    assert std.shape == mean.shape
    assert jnp.all(std > 0)

    y = vae.decode(mean)

    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(y))


@pytest.mark.parametrize("quant", [True, False], ids=["sd", "flux-style"])
def test_twin_parity(quant, key):
    import torch

    from torch_twins.vae import AutoencoderKLTwin

    torch.manual_seed(0)

    cfg = {**SMALL, "use_quant_conv": quant}

    twin = AutoencoderKLTwin(**cfg)
    twin.eval()

    ours = filter_eval_shape(AutoencoderKL, **cfg, key=key)
    ours = load_state_dict(ours, convert_vae_state_dict(ours, twin.state_dict()))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        mean_t, std_t = twin.encode(torch.as_tensor(x))
        dec_t = twin.decode(mean_t).numpy()
        mean_t, std_t = mean_t.numpy(), std_t.numpy()

    mean, std = ours.encode(jnp.asarray(np.moveaxis(x, 1, -1)))
    dec = ours.decode(mean)

    assert np.allclose(np.moveaxis(np.asarray(mean), -1, 1), mean_t, atol=1e-4)
    assert np.allclose(np.moveaxis(np.asarray(std), -1, 1), std_t, atol=1e-4)
    assert np.allclose(np.moveaxis(np.asarray(dec), -1, 1), dec_t, atol=1e-4)


def test_legacy_attention_keys(key):
    r"""Old VAE checkpoints name the mid attention query/key/value/proj_attn."""

    import torch

    from torch_twins.vae import AutoencoderKLTwin

    torch.manual_seed(0)

    twin = AutoencoderKLTwin(**SMALL)
    sd = {}
    for k, v in twin.state_dict().items():
        k = k.replace(".to_q.", ".query.")
        k = k.replace(".to_k.", ".key.")
        k = k.replace(".to_v.", ".value.")
        k = k.replace(".to_out.0.", ".proj_attn.")
        sd[k] = v

    ours = filter_eval_shape(AutoencoderKL, **SMALL, key=key)
    ours = load_state_dict(ours, convert_vae_state_dict(ours, sd))

    x = jnp.zeros((1, 16, 16, 3))
    mean, _ = ours.encode(x)

    assert jnp.all(jnp.isfinite(mean))
