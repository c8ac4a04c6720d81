r"""Property tests for layer options that the shape-grid tests don't exercise:
periodic (circular) padding, identity initialization, GroupNorm statistics."""

import jax
import jax.numpy as jnp
import pytest

from azula_tpu.nn.layers import ConvNd, GroupNorm
from azula_tpu.nn.unet import UNet
from azula_tpu.ops.norm import group_norm_silu


def test_periodic_conv_shift_equivariance(key):
    r"""With circular padding, convolution commutes with circular shifts."""

    k1, k2 = jax.random.split(key)

    conv = ConvNd(4, 4, spatial=2, kernel_size=3, padding=1, periodic=True, key=k1)

    x = jax.random.normal(k2, (2, 8, 8, 4))

    shifted_then_conv = conv(jnp.roll(x, (3, 5), axis=(1, 2)))
    conv_then_shifted = jnp.roll(conv(x), (3, 5), axis=(1, 2))

    assert jnp.allclose(shifted_then_conv, conv_then_shifted, atol=1e-5)


def test_periodic_unet_shift_equivariance(key):
    r"""A fully periodic UNet is equivariant to circular shifts by the total
    downsampling factor (reference periodic option, `azula/nn/unet.py:161`)."""

    k1, k2 = jax.random.split(key)

    unet = UNet(
        in_channels=3,
        out_channels=3,
        hid_channels=(4, 8),
        hid_blocks=(1, 1),
        spatial=2,
        periodic=True,
        key=k1,
    )

    x = jax.random.normal(k2, (1, 16, 16, 3))

    shift = (2, 4)  # multiples of the stride-2 downsampling
    a = unet(jnp.roll(x, shift, axis=(1, 2)))
    b = jnp.roll(unet(x), shift, axis=(1, 2))

    assert jnp.allclose(a, b, atol=1e-4)


def test_identity_init(key):
    r"""identity_init makes the convolution a near-identity
    (reference `azula/nn/layers.py:56-66`)."""

    k1, k2 = jax.random.split(key)

    conv = ConvNd(
        4, 4, spatial=2, kernel_size=3, padding=1, identity_init=True, bias=False, key=k1
    )

    x = jax.random.normal(k2, (2, 8, 8, 4))
    y = conv(x)

    # Output is dominated by the identity tap (residual perturbation is 1e-2 scale)
    assert jnp.max(jnp.abs(y - x)) < 0.5
    corr = jnp.sum(x * y) / jnp.sqrt(jnp.sum(x**2) * jnp.sum(y**2))
    assert corr > 0.95


def test_group_norm_statistics(key):
    r"""Group norm output has zero mean / unit variance per (batch, group)."""

    x = 3.0 + 2.0 * jax.random.normal(key, (4, 8, 8, 32))

    gn = GroupNorm(8, 32)
    y = gn(x)

    g = y.reshape(4, -1, 8, 4)
    mean = g.mean(axis=(1, 3))
    var = g.var(axis=(1, 3))

    assert jnp.max(jnp.abs(mean)) < 1e-4
    assert jnp.max(jnp.abs(var - 1)) < 1e-3


def test_group_norm_large_mean(key):
    r"""Float32 statistics survive |mean| >> std (the raw E[x^2] - E[x]^2 fold
    cancels catastrophically here; the shifted-moment fold must not)."""

    x = 4096.0 + 0.1 * jax.random.normal(key, (2, 16, 16, 32))

    y = GroupNorm(8, 32)(x)

    g = y.reshape(2, -1, 8, 4)
    mean = g.mean(axis=(1, 3))
    var = g.var(axis=(1, 3))

    assert jnp.max(jnp.abs(mean)) < 1e-2
    assert jnp.max(jnp.abs(var - 1)) < 1e-2


def test_group_norm_large_mean_aligned(key):
    r"""Large-mean robustness at a kernel-eligible shape (C % 128 == 0,
    multi-block spatial), including the VJP: on TPU this exercises the Pallas
    statistics path, which the C=32 case above cannot reach (ADVICE r3)."""

    from azula_tpu.ops.norm import group_stats, stats_kernel_eligible

    B, HW, C, G = 2, 1024, 128, 8
    assert stats_kernel_eligible((B, HW, C))

    x = 4096.0 + 0.1 * jax.random.normal(key, (B, 32, 32, C))

    y = GroupNorm(G, C)(x)
    g = y.reshape(B, -1, G, C // G)
    assert jnp.max(jnp.abs(g.mean(axis=(1, 3)))) < 1e-2
    assert jnp.max(jnp.abs(g.var(axis=(1, 3)) - 1)) < 1e-2

    # VJP of the statistics against finite differences of the mean.
    def f(x):
        m, v = group_stats(x.reshape(B, -1, C), G)
        return jnp.sum(m) + jnp.sum(v)

    grad = jax.grad(f)(x)
    eps = 1e-2
    probe = jnp.zeros_like(x).at[0, 3, 5, 7].set(1.0)
    fd = (f(x + eps * probe) - f(x - eps * probe)) / (2 * eps)
    assert abs(float(jnp.vdot(grad, probe)) - float(fd)) < 1e-3


def test_group_norm_silu_fusion(key):
    r"""The fused GroupNorm-SiLU equals the unfused composition."""

    x = jax.random.normal(key, (2, 4, 4, 16), dtype=jnp.bfloat16)

    gn = GroupNorm(4, 16)
    ref = jax.nn.silu(gn(x).astype(jnp.float32)).astype(jnp.bfloat16)
    out = group_norm_silu(x, 4)

    assert jnp.allclose(out.astype(jnp.float32), ref.astype(jnp.float32), atol=2e-2)


@pytest.mark.parametrize("groups,channels", [(32, 256), (1, 16), (16, 16)])
def test_group_norm_matches_reference_semantics(groups, channels, key):
    r"""Channels-last group norm matches torch.nn.GroupNorm on NCHW data."""

    torch = pytest.importorskip("torch")

    x = jax.random.normal(key, (2, 4, 4, channels))

    ours = GroupNorm(groups, channels)(x)

    x_t = torch.as_tensor(jax.device_get(x)).permute(0, 3, 1, 2)
    ref = torch.nn.functional.group_norm(x_t, min(groups, channels), eps=1e-5)
    ref = ref.permute(0, 2, 3, 1).numpy()

    assert jnp.allclose(ours, ref, atol=1e-5)


def test_group_stats_guarded_contract(key):
    r"""The guarded-raw statistics keep raw's exactness at sane activation
    scales and rescue the variance (within the documented subsample error)
    in the pathological |mean| >> std regime where raw cancels totally."""

    from azula_tpu.ops.norm import _stats_twopass, group_stats

    B, HW, C, G = 2, 65536, 128, 8

    # Sane scale: raw branch, near-exact.
    x = 10.0 + 2.0 * jax.random.normal(key, (B, HW, C))
    m, v = group_stats(x, G, "guarded")
    mr, vr = _stats_twopass(x, G)
    assert jnp.max(jnp.abs(m - mr)) < 1e-4
    assert jnp.max(jnp.abs(v - vr) / vr) < 1e-3

    # Pathological: raw would produce garbage (its var error is O(mean^2 eps)
    # = O(1) here, against a true var of 0.01); guarded must stay within the
    # documented subsample tolerance.
    x = 4096.0 + 0.1 * jax.random.normal(key, (B, HW, C))
    m, v = group_stats(x, G, "guarded")
    mr, vr = _stats_twopass(x, G)
    assert jnp.max(jnp.abs(m - mr)) < 1e-2
    assert jnp.max(jnp.abs(v - vr) / vr) < 0.05
