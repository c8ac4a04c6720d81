r"""Cross-component integration tests: pretrained-style wrappers composed with
guidance and compiled sampling (BASELINE.md workload 4 shape: ADM + CFG)."""

import functools
import jax
import jax.numpy as jnp
import pytest

from azula_tpu.denoise import GaussianDenoiser
from azula_tpu.guidance import CFGDenoiser
from azula_tpu.linalg.covariance import DiagonalCovariance
from azula_tpu.models.adm import make_model
from azula_tpu.noise import VPSchedule
from azula_tpu.sample import DDIMSampler, EulerSampler, zEABSampler


@pytest.fixture(scope="module")
def adm_denoiser():
    return make_model(
        image_size=32,
        num_channels=32,
        num_res_blocks=1,
        channel_mult=[1, 2],
        attention_resolutions=[16],
        num_classes=10,
        num_head_channels=16,
        learn_var=True,
        clip_mean=True,
        key=jax.random.key(0),
    )


def test_adm_cfg_sampling(adm_denoiser, key):
    r"""CFG over a class-conditional ADM model: 2 backbone calls per step inside
    one compiled scan (workload 4)."""

    cfg = CFGDenoiser(adm_denoiser)
    sampler = DDIMSampler(cfg, eta=0.0, steps=4)

    B = 2
    x1 = sampler.init(key, (B, 32, 32, 3))

    x0 = sampler(
        x1,
        positive={"label": jnp.asarray([3, 7])},
        negative={"label": jnp.asarray([0, 0])},
        guidance=2.0,
    )

    assert x0.shape == (B, 32, 32, 3)
    assert jnp.all(jnp.isfinite(x0))


def test_adm_bf16_sampling(adm_denoiser, key):
    r"""bf16 backbone + f32 sampler math end to end."""

    denoiser = adm_denoiser.tree_replace(
        backbone=adm_denoiser.backbone.astype(jnp.bfloat16)
    )
    sampler = DDIMSampler(denoiser, steps=4)

    x1 = sampler.init(key, (2, 32, 32, 3))
    x0 = sampler(x1, label=jnp.asarray([1, 2]))

    assert x0.dtype == jnp.float32
    assert jnp.all(jnp.isfinite(x0))


def test_unet_ddim_workload(key):
    r"""BASELINE.md workload 2 shape: UNet denoiser on 3x32x32, DDIM sampling
    as one compiled scan (tiny widths on CPU)."""

    from azula_tpu.denoise import KarrasDenoiser
    from azula_tpu.nn.embedding import Modulated
    from azula_tpu.nn.unet import UNet

    k1, k2, k3 = jax.random.split(key, 3)

    backbone = Modulated(
        UNet(3, 3, mod_features=8, hid_channels=(4, 8), hid_blocks=(1, 1), key=k1),
        mod_features=8,
        key=k2,
    )
    denoiser = KarrasDenoiser(backbone, VPSchedule())

    sampler = DDIMSampler(denoiser, steps=8)
    x1 = sampler.init(k3, (2, 32, 32, 3))
    x0 = sampler(x1)

    assert x0.shape == (2, 32, 32, 3)
    assert jnp.all(jnp.isfinite(x0))


def test_attention_masks(key):
    r"""Boolean and additive masks agree with manual masked attention."""

    import numpy as np

    from azula_tpu.ops.attention import dot_product_attention

    k1, k2, k3 = jax.random.split(key, 3)

    q = jax.random.normal(k1, (1, 2, 6, 8))
    k = jax.random.normal(k2, (1, 2, 6, 8))
    v = jax.random.normal(k3, (1, 2, 6, 8))

    causal = jnp.tril(jnp.ones((6, 6), dtype=bool))

    out_bool = dot_product_attention(q, k, v, mask=causal)
    out_add = dot_product_attention(
        q, k, v, mask=jnp.where(causal, 0.0, -jnp.inf)
    )

    assert jnp.allclose(out_bool, out_add, atol=1e-6)

    # Last query attends to everything; first only to itself
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    w = jax.nn.softmax(jnp.where(causal, logits, -jnp.inf), axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", w, v)

    assert jnp.allclose(out_bool, ref, atol=1e-5)


def test_multistep_order_improves_accuracy(key):
    r"""Higher-order exponential AB samplers track the probability-flow ODE more
    accurately at few steps (checked against a near-exact 512-step Euler
    solution of the analytical Gaussian denoiser)."""

    denoiser = GaussianDenoiser(
        mean=jnp.asarray([1.0, -0.5, 0.25, 2.0]),
        cov=DiagonalCovariance(jnp.asarray([0.5, 1.0, 2.0, 0.25])),
        schedule=VPSchedule(),
    )

    x1 = jax.random.normal(key, (256, 4))

    exact = EulerSampler(denoiser, steps=512)(x1)

    def err(sampler_cls, steps, **kw):
        out = sampler_cls(denoiser, steps=steps, **kw)(x1)
        return float(jnp.sqrt(jnp.mean((out - exact) ** 2)))

    e1 = err(functools.partial(zEABSampler, order=1), 8)
    e2 = err(functools.partial(zEABSampler, order=2), 8)
    e3 = err(functools.partial(zEABSampler, order=3), 8)

    assert e2 < e1, (e1, e2)
    assert e3 < e1, (e1, e3)
