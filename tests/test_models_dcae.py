r"""Tests for the native DC-AE (Sana latent autoencoder): forward shapes,
twin parity on golden random weights (linear and quadratic attention paths,
both upsample variants), and full-size construction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.sana.autoencoder import AutoencoderDC, convert_dcae_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity

SMALL = dict(  # noqa: C408
    in_channels=3,
    latent_channels=4,
    block_types=("ResBlock", "EfficientViTBlock"),
    block_out_channels=(8, 16),
    encoder_layers_per_block=(1, 1),
    decoder_layers_per_block=(2, 1),
    qkv_multiscales=((), (5,)),
    head_dim=4,
)


def test_dcae_shapes(key):
    ae = AutoencoderDC(**SMALL, key=key)

    x = jax.random.normal(key, (2, 16, 16, 3))
    z = ae.encode(x)
    assert z.shape == (2, 8, 8, 4)

    y = ae.decode(z)
    assert y.shape == (2, 16, 16, 3)
    assert jnp.all(jnp.isfinite(y))


@pytest.mark.parametrize("interpolate", [True, False], ids=["interp", "pshuffle"])
@pytest.mark.parametrize("size", [32, 4], ids=["linear-attn", "quadratic-attn"])
def test_dcae_twin_parity(interpolate, size, key):
    import torch

    from torch_twins.dc_ae import AutoencoderDCTwin

    torch.manual_seed(0)

    twin = AutoencoderDCTwin(**SMALL, upsample_interpolate=interpolate)
    twin.eval()

    ours = filter_eval_shape(
        AutoencoderDC, **SMALL, upsample_interpolate=interpolate, key=key
    )
    ours = load_state_dict(ours, convert_dcae_state_dict(ours, twin.state_dict()))

    x = np.random.default_rng(0).normal(size=(2, size, size, 3)).astype(np.float32)

    with torch.no_grad():
        z_t = twin.encode(torch.from_numpy(x).movedim(-1, 1))
        y_t = twin.decode(z_t)

    z = ours.encode(jnp.asarray(x))
    y = ours.decode(z)

    z_t = z_t.movedim(1, -1).numpy()
    y_t = y_t.movedim(1, -1).numpy()

    # the bottleneck spatial size decides the attention path
    assert ((size // 2) ** 2 > SMALL["head_dim"]) == (size == 32)

    np.testing.assert_allclose(np.asarray(z), z_t, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(y), y_t, atol=1e-4, rtol=1e-3)


def test_dcae_full_size_construct():
    r"""The published dc-ae-f32c32-sana configuration constructs abstractly
    with the expected 32x compression and parameter count scale."""

    ae = filter_eval_shape(AutoencoderDC, key=jax.random.key(0))

    assert len(ae.encoder.down_blocks) == 6  # 5 downsamples -> 32x compression
    assert ae.encoder.conv_out.weight.shape[-1] == 32

    leaves = jax.tree.leaves(ae, is_leaf=lambda x: hasattr(x, "shape"))
    count = sum(np.prod(leaf.shape) for leaf in leaves if hasattr(leaf, "shape"))
    assert 200e6 < count < 400e6  # dc-ae-f32c32 is a ~324M-parameter codec
