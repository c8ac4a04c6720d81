r"""Tests for azula_tpu.nn backbones (mirrors reference tests/test_nn_{unet,dit,vit}.py:
shape grids, finite grads, state-dict round trips, reduced-precision error budgets).
Channels-last layout: tensors are (B, *spatial, C)."""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.nn.dit import DiT
from azula_tpu.nn.layers import Patchify, Unpatchify
from azula_tpu.nn.unet import UNet
from azula_tpu.nn.vit import ViT
from azula_tpu.utils.pytree import combine, load_state_dict, partition, state_dict


def _check_grads(module, forward):
    params, static = partition(module)

    def loss_fn(params):
        return jnp.sum(jnp.square(forward(combine(params, static))))

    grads = jax.grad(loss_fn)(params)

    for g in jax.tree.leaves(grads):
        assert jnp.all(jnp.isfinite(g))


@pytest.mark.parametrize(
    "length, mod_features, dropout, spatial, checkpointing",
    [
        # Odd/even lengths x conditioning x spatial rank (reference grid,
        # tests/test_nn_unet.py), with checkpointing covered once
        (15, 0, None, 1, False),
        (15, 16, 0.1, 2, False),
        (16, 0, 0.1, 1, False),
        (16, 16, None, 2, False),
        (15, 16, None, 1, False),
        (16, 0, None, 2, False),
        (16, 16, 0.1, 2, True),
    ],
)
def test_UNet(length, mod_features, dropout, spatial, checkpointing, key):
    in_channels, out_channels, batch_size = 3, 5, 4
    k_model, k_x, k_mod, k_drop = jax.random.split(key, 4)

    make = lambda k: UNet(
        in_channels=in_channels,
        out_channels=out_channels,
        mod_features=mod_features,
        hid_channels=(5, 7, 11),
        hid_blocks=(1, 2, 3),
        dropout=dropout,
        spatial=spatial,
        checkpointing=checkpointing,
        key=k,
    )

    unet = make(k_model)

    x = jax.random.normal(k_x, (batch_size,) + (length,) * spatial + (in_channels,))
    mod = jax.random.normal(k_mod, (batch_size, mod_features)) if mod_features else None

    # Training call (dropout active)
    y = unet(x, mod, key=k_drop)

    assert y.shape == (batch_size,) + (length,) * spatial + (out_channels,)
    assert jnp.all(jnp.isfinite(y))

    # Grads finite for all parameters
    _check_grads(unet, lambda m: m(x, mod, key=k_drop))

    # State-dict round trip (reference `test_nn_unet.py:63-76`)
    sd = state_dict(unet)
    copy = load_state_dict(make(jax.random.key(99)), sd)

    assert jnp.allclose(unet(x, mod), copy(x, mod))

    # bfloat16 error budget (reference fp16 budget, `test_nn_unet.py:78-91`,
    # adapted to the TPU-native low-precision dtype)
    y16 = unet.astype(jnp.bfloat16)(x.astype(jnp.bfloat16), None if mod is None else mod.astype(jnp.bfloat16))
    y32 = unet(x, mod)

    err = jnp.abs(y32 - y16.astype(jnp.float32)).ravel()

    assert jnp.quantile(err, 0.99) < 5e-2
    assert jnp.max(err) < 5e-1


@pytest.mark.parametrize(
    "mod_features, pos_channels, dropout, rope, checkpointing",
    [
        (0, 1, None, False, False),
        (16, 2, 0.1, True, False),
        (16, 1, None, True, False),
        (0, 2, 0.1, False, False),
        (16, 2, None, False, True),
    ],
)
def test_DiT(mod_features, pos_channels, dropout, rope, checkpointing, key):
    length, in_channels, out_channels, batch_size = 16, 3, 5, 4
    k_model, k_x, k_mod, k_pos, k_drop = jax.random.split(key, 5)

    make = lambda k: DiT(
        in_channels=in_channels,
        out_channels=out_channels,
        mod_features=mod_features,
        pos_channels=pos_channels,
        hid_channels=16,
        hid_blocks=3,
        attention_heads=4,
        dropout=dropout,
        rope=rope,
        checkpointing=checkpointing,
        key=k,
    )

    dit = make(k_model)

    x = jax.random.normal(k_x, (batch_size, length, in_channels))
    mod = jax.random.normal(k_mod, (batch_size, mod_features)) if mod_features else None
    pos = jax.random.normal(k_pos, (length, pos_channels))

    y = dit(x, mod, pos=pos, key=k_drop)

    assert y.shape == (batch_size, length, out_channels)
    assert jnp.all(jnp.isfinite(y))

    _check_grads(dit, lambda m: m(x, mod, pos=pos, key=k_drop))

    sd = state_dict(dit)
    copy = load_state_dict(make(jax.random.key(99)), sd)

    assert jnp.allclose(dit(x, mod, pos=pos), copy(x, mod, pos=pos))


@pytest.mark.parametrize("length", [15, 16])
@pytest.mark.parametrize("mod_features", [0, 16])
@pytest.mark.parametrize("spatial", [1, 2])
@pytest.mark.parametrize("patch_size", [1, 4])
def test_ViT(length, mod_features, spatial, patch_size, key):
    in_channels, out_channels, batch_size = 3, 5, 2
    k_model, k_x, k_mod = jax.random.split(key, 3)

    if length % patch_size != 0:
        pytest.skip("length must be divisible by patch size")

    vit = ViT(
        in_channels=in_channels,
        out_channels=out_channels,
        mod_features=mod_features,
        hid_channels=16,
        hid_blocks=2,
        attention_heads=4,
        spatial=spatial,
        patch_size=patch_size,
        key=k_model,
    )

    x = jax.random.normal(k_x, (batch_size,) + (length,) * spatial + (in_channels,))
    mod = jax.random.normal(k_mod, (batch_size, mod_features)) if mod_features else None

    y = vit(x, mod)

    assert y.shape == (batch_size,) + (length,) * spatial + (out_channels,)
    assert jnp.all(jnp.isfinite(y))

    _check_grads(vit, lambda m: m(x, mod))


@pytest.mark.parametrize("spatial", [1, 2, 3])
def test_patchify_roundtrip(spatial, key):
    patch = (2,) * spatial
    shape = (2,) + (8,) * spatial + (3,)

    x = jax.random.normal(key, shape)

    p = Patchify(patch)(x)
    assert p.shape == (2,) + (4,) * spatial + (3 * 2**spatial,)

    y = Unpatchify(patch)(p)
    assert jnp.allclose(y, x)


def test_reference_nn_utils_aliases(key):
    r"""The reference's nn.utils surface (checkpoint / skip_init /
    get_module_device) is available under its own names."""

    from azula_tpu.nn.layers import Linear
    from azula_tpu.nn.utils import checkpoint, get_module_device, skip_init
    from azula_tpu.utils.pytree import load_state_dict, state_dict

    lin = skip_init(Linear, 3, 5, key=key)
    assert lin.weight.shape == (3, 5) and not hasattr(lin.weight, "devices")

    real = Linear(3, 5, key=key)
    filled = load_state_dict(lin, state_dict(real))
    x = jax.random.normal(key, (2, 3))
    assert jnp.allclose(filled(x), real(x))

    f = checkpoint(lambda w, v: jnp.tanh(v @ w), reentrant=True)
    g = jax.grad(lambda w: jnp.sum(f(w, x)))(real.weight)
    g_ref = jax.grad(lambda w: jnp.sum(jnp.tanh(x @ w)))(real.weight)
    assert jnp.allclose(g, g_ref, atol=1e-6)

    assert get_module_device(real) is not None
    assert get_module_device(lin) is None
