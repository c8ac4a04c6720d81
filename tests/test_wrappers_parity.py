r"""Preconditioning parity for the wrapper families (sd/flux/sana/edm) against
the reference implementations, using identical elementwise dummy backbones in
torch and JAX (the reference wrappers import diffusers only inside load_model,
so the math itself is directly comparable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sys
import types

from azula_tpu.models.edm import ElucidatedDenoiser
from azula_tpu.models.flux import FluxDenoiser
from azula_tpu.models.sana import SanaDenoiser
from azula_tpu.models.sd import StableDenoiser, sd_sigmas
from azula_tpu.nn.module import Module

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

A, B_, C_ = 0.7, 0.013, 0.21  # arbitrary dummy-backbone constants


@pytest.fixture(scope="module")
def reference():
    sys.modules.setdefault("gdown", types.ModuleType("gdown"))
    sys.path.insert(0, "/root/reference")
    try:
        import azula.plugins.edm as redm
        import azula.plugins.flux as rflux
        import azula.plugins.sana as rsana
        import azula.plugins.sd as rsd

        yield types.SimpleNamespace(sd=rsd, flux=rflux, sana=rsana, edm=redm)
    finally:
        sys.path.remove("/root/reference")


def _rand(key, shape):
    return np.asarray(jax.random.normal(key, shape), dtype=np.float32)


def test_sd_parity(reference, key):
    import torch

    class TorchBackbone(torch.nn.Module):
        def forward(self, sample=None, timestep=None, encoder_hidden_states=None):
            out = (
                A * sample
                + B_ * timestep.float()[:, None, None, None]
                + C_ * encoder_hidden_states.mean()
            )
            return types.SimpleNamespace(sample=out)

    class JaxBackbone(Module):
        def __init__(self):
            self.w = jnp.ones(())  # dtype marker

        def __call__(self, sample=None, timestep=None, encoder_hidden_states=None):
            return (
                A * sample
                + B_ * timestep.astype(jnp.float32)[:, None, None, None]
                + C_ * encoder_hidden_states.mean()
            )

    sigmas = sd_sigmas()

    for prediction in ("epsilon", "velocity"):
        theirs = reference.sd.StableDenoiser(
            TorchBackbone(), torch.as_tensor(sigmas), prediction=prediction
        ).eval()
        ours = StableDenoiser(JaxBackbone(), prediction=prediction)

        z = _rand(key, (2, 4, 8, 8))  # torch layout (B, C, H, W)
        t = np.asarray([0.3, 0.8], dtype=np.float32)
        prompt = _rand(jax.random.key(7), (2, 5, 6))

        with torch.no_grad():
            ref_mean = theirs(
                torch.as_tensor(z), torch.as_tensor(t), torch.as_tensor(prompt)
            ).mean.numpy()

        our_mean = ours(
            jnp.asarray(np.transpose(z, (0, 2, 3, 1))), jnp.asarray(t), jnp.asarray(prompt)
        ).mean

        assert np.allclose(
            np.transpose(ref_mean, (0, 2, 3, 1)), np.asarray(our_mean), atol=1e-4
        ), prediction


def test_flux_parity(reference, key):
    import torch

    class TorchBackbone(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.p = torch.nn.Parameter(torch.ones(1))  # defines the module dtype

        def forward(self, timestep=None, hidden_states=None, encoder_hidden_states=None,
                    pooled_projections=None, img_ids=None, txt_ids=None, guidance=None):
            out = (
                A * hidden_states
                + B_ * timestep.float()[:, None, None]
                + C_ * encoder_hidden_states.mean()
                + 0.001 * pooled_projections.mean()
                + 1e-4 * img_ids.sum()
                + 0.01 * guidance.float().mean()
            )
            return types.SimpleNamespace(sample=out)

    class JaxBackbone(Module):
        def __init__(self):
            self.w = jnp.ones(())

        def __call__(self, timestep=None, hidden_states=None, encoder_hidden_states=None,
                     pooled_projections=None, img_ids=None, txt_ids=None, guidance=None):
            return (
                A * hidden_states
                + B_ * timestep.astype(jnp.float32)[:, None, None]
                + C_ * encoder_hidden_states.mean()
                + 0.001 * pooled_projections.mean()
                + 1e-4 * img_ids.sum()
                + 0.01 * guidance.astype(jnp.float32).mean()
            )

    theirs = reference.flux.FluxDenoiser(TorchBackbone()).eval()
    ours = FluxDenoiser(JaxBackbone())

    # The flux latent is channels-last in BOTH (reference z_t: (B, H, W, 64))
    z = _rand(key, (2, 4, 4, 64))
    t = np.asarray([0.25, 0.9], dtype=np.float32)
    clip = _rand(jax.random.key(3), (2, 16))
    t5 = _rand(jax.random.key(4), (2, 5, 8))

    with torch.no_grad():
        ref_mean = theirs(
            torch.as_tensor(z),
            torch.as_tensor(t),
            prompt_clip=torch.as_tensor(clip),
            prompt_t5=torch.as_tensor(t5),
            guidance=4.0,
        ).mean.numpy()

    our_mean = ours(
        jnp.asarray(z),
        jnp.asarray(t),
        prompt_clip=jnp.asarray(clip),
        prompt_t5=jnp.asarray(t5),
        guidance=4.0,
    ).mean

    assert np.allclose(ref_mean, np.asarray(our_mean), atol=1e-4)


def test_sana_parity(reference, key):
    import torch

    class TorchBackbone(torch.nn.Module):
        def forward(self, timestep=None, hidden_states=None, encoder_hidden_states=None,
                    encoder_attention_mask=None):
            out = (
                A * hidden_states
                + B_ * timestep.float()[:, None, None, None] / 1000
                + C_ * (encoder_hidden_states * encoder_attention_mask[..., None]).mean()
            )
            return types.SimpleNamespace(sample=out)

    class JaxBackbone(Module):
        def __init__(self):
            self.w = jnp.ones(())

        def __call__(self, timestep=None, hidden_states=None, encoder_hidden_states=None,
                     encoder_attention_mask=None):
            return (
                A * hidden_states
                + B_ * timestep.astype(jnp.float32)[:, None, None, None] / 1000
                + C_ * (encoder_hidden_states * encoder_attention_mask[..., None]).mean()
            )

    theirs = reference.sana.SanaDenoiser(TorchBackbone()).eval()
    ours = SanaDenoiser(JaxBackbone())

    z = _rand(key, (2, 32, 4, 4))  # torch layout (B, C, H, W)
    t = np.asarray([0.1, 0.7], dtype=np.float32)
    prompt = _rand(jax.random.key(5), (2, 6, 8))
    mask = np.ones((2, 6), dtype=np.float32)

    with torch.no_grad():
        ref_mean = theirs(
            torch.as_tensor(z),
            torch.as_tensor(t),
            prompt_embeds=torch.as_tensor(prompt),
            prompt_mask=torch.as_tensor(mask),
        ).mean.numpy()

    our_mean = ours(
        jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
        jnp.asarray(t),
        prompt_embeds=jnp.asarray(prompt),
        prompt_mask=jnp.asarray(mask),
    ).mean

    assert np.allclose(
        np.transpose(ref_mean, (0, 2, 3, 1)), np.asarray(our_mean), atol=1e-4
    )


def test_vdm_wrapper_parity(reference, key):
    r"""VelocityDenoiser preconditioning (the backbone itself is parity-tested
    separately in test_models_vdm)."""

    import torch

    sys.path.insert(0, "/root/reference")
    try:
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tv_t = types.ModuleType("torchvision.transforms")
            tv_f = types.ModuleType("torchvision.transforms.functional")
            tv.transforms, tv_t.functional = tv_t, tv_f
            sys.modules.update({
                "torchvision": tv,
                "torchvision.transforms": tv_t,
                "torchvision.transforms.functional": tv_f,
            })
        from azula.plugins.vdm import VelocityDenoiser as RefVelocity
    finally:
        sys.path.remove("/root/reference")

    from azula_tpu.models.vdm import VelocityDenoiser

    class TorchBackbone(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.p = torch.nn.Parameter(torch.ones(1))

        def forward(self, x, t, **kwargs):
            return A * x + B_ * t.float()[:, None, None, None]

    class JaxBackbone(Module):
        def __init__(self):
            self.w = jnp.ones(())

        def __call__(self, x, t, **kwargs):
            return A * x + B_ * t.astype(jnp.float32)[:, None, None, None]

    theirs = RefVelocity(TorchBackbone()).eval()
    ours = VelocityDenoiser(JaxBackbone())

    x = _rand(key, (2, 3, 8, 8))
    t = np.asarray([0.2, 0.85], dtype=np.float32)

    with torch.no_grad():
        ref_mean = theirs(torch.as_tensor(x), torch.as_tensor(t)).mean.numpy()

    our_mean = ours(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t)
    ).mean

    assert np.allclose(
        np.transpose(ref_mean, (0, 2, 3, 1)), np.asarray(our_mean), atol=1e-4
    )


def test_edm_parity(reference, key):
    import torch

    class TorchBackbone(torch.nn.Module):
        def forward(self, x, sigma, class_labels=None):
            return A * x + B_ * sigma.float().reshape(-1, 1, 1, 1) + C_ * class_labels.mean()

    class JaxBackbone(Module):
        def __init__(self):
            self.w = jnp.ones(())

        def __call__(self, x, sigma, class_labels=None):
            return (
                A * x
                + B_ * sigma.astype(jnp.float32).reshape(-1, 1, 1, 1)
                + C_ * class_labels.mean()
            )

    theirs = reference.edm.ElucidatedDenoiser(TorchBackbone()).eval()
    ours = ElucidatedDenoiser(JaxBackbone())

    x = _rand(key, (2, 3, 8, 8))
    t = np.asarray([0.4, 0.95], dtype=np.float32)
    label = np.eye(10, dtype=np.float32)[[1, 7]]

    with torch.no_grad():
        ref_mean = theirs(
            torch.as_tensor(x), torch.as_tensor(t), label=torch.as_tensor(label)
        ).mean.numpy()

    our_mean = ours(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t),
        label=jnp.asarray(label),
    ).mean

    assert np.allclose(
        np.transpose(ref_mean, (0, 2, 3, 1)), np.asarray(our_mean), atol=1e-4
    )
