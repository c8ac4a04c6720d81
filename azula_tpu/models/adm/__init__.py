r"""Ablated diffusion model (ADM / guided-diffusion) family.

Capability parity with the reference `azula/plugins/adm/__init__.py`: the
`AblatedDenoiser` wrapper translating the continuous-time denoiser API to the
checkpoints' discrete epsilon-prediction parametrization, `load_model(name)`
over the `cards.yaml` registry, and a PyTorch-to-JAX weight converter for
bit-comparable inference.

References:
    | Diffusion Models Beat GANs on Image Synthesis (Dhariwal et al., 2021)
    | https://arxiv.org/abs/2105.05233
"""

from __future__ import annotations

__all__ = [
    "AblatedDenoiser",
    "ADMUNet",
    "load_model",
    "make_model",
]

import jax
import jax.numpy as jnp
import numpy as np

from collections.abc import Sequence
from jax import Array

from ...denoise import Denoiser, GaussianPosterior, broadcast_scales
from ...hub import download
from ...nn.utils import get_module_dtype
from ...noise import Schedule, VPSchedule
from ..utils import load_cards
from .backbone import ADMUNet


def discrete_sigmas(
    schedule: str = "linear", steps: int = 1000
) -> np.ndarray:
    r"""Returns the discrete noise-level table :math:`\sigma_i = \sqrt{1 -
    \bar\alpha_i}` of the checkpoints' beta schedule, computed in float64 on the
    host (reference `adm/__init__.py:66-84`; float64 matters for the cumprod).
    """

    if schedule == "linear":
        beta = np.linspace(0.1 / steps, 20.0 / steps, steps, dtype=np.float64)
    elif schedule == "cosine":
        t = np.linspace(0, 1, steps + 1, dtype=np.float64)
        alpha_bar = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        beta = 1 - alpha_bar[1:] / alpha_bar[:-1]
        beta = np.clip(beta, None, 0.999)
    else:
        raise ValueError(f"Unknown discrete schedule '{schedule}'.")

    alpha_bar = np.cumprod(1 - beta)

    return np.sqrt(1 - alpha_bar)


class AblatedDenoiser(Denoiser):
    r"""Creates an ablated (epsilon-prediction) denoiser.

    Continuous time maps to the checkpoint's discrete timestep by searching the
    noise ratio in the precomputed `sigmas` table (reference
    `adm/__init__.py:109-114`); preconditioning is
    :math:`c_\mathrm{out} = -\sigma/\alpha`, :math:`c_\mathrm{skip} = 1/\alpha`.

    Arguments:
        backbone: A time conditional network.
        schedule: A noise schedule. Defaults to `VPSchedule(1e-2, 1e-2)`.
        clip_mean: Whether the posterior mean is clipped to :math:`[-1, 1]`
            (inference behavior of the pretrained models).
        learn_var: Whether the variance is learned (doubled output channels).
        discrete_schedule: The checkpoint's beta schedule (`'linear'`/`'cosine'`).
        discrete_steps: The checkpoint's number of discrete steps.
    """

    def __init__(
        self,
        backbone: ADMUNet,
        schedule: Schedule | None = None,
        clip_mean: bool = False,
        learn_var: bool = False,
        discrete_schedule: str = "linear",
        discrete_steps: int = 1000,
    ) -> None:
        self.backbone = backbone

        if schedule is None:
            self.schedule = VPSchedule(alpha_min=1e-2, sigma_min=1e-2)
        else:
            self.schedule = schedule

        self.clip_mean = clip_mean
        self.learn_var = learn_var

        self.sigmas = jnp.asarray(
            discrete_sigmas(discrete_schedule, discrete_steps), dtype=jnp.float32
        )

    def __call__(
        self,
        x_t: Array,
        t: Array,
        label: Array | None = None,
        key: Array | None = None,
        **kwargs,
    ) -> GaussianPosterior:
        r"""
        Arguments:
            x_t: A noisy tensor, channels-last, with shape :math:`(B, H, W, 3)`.
            t: The time :math:`t`, with shape :math:`()` or :math:`(B)`.
            label: The class label as an integer, with shape :math:`(B)`.

        Returns:
            The Gaussian posterior
            :math:`\mathcal{N}(X \mid \mu_\phi(x_t \mid c), \sigma^2_\phi(x_t \mid c))`.
        """

        alpha_t, sigma_t = self.schedule(t)
        alpha_t, sigma_t = broadcast_scales(alpha_t, sigma_t, x_t)

        c_in = jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_out = -sigma_t / alpha_t
        c_skip = 1 / alpha_t
        c_time = sigma_t * jax.lax.rsqrt(alpha_t**2 + sigma_t**2)
        c_time = jnp.searchsorted(self.sigmas, c_time.ravel())
        c_var = sigma_t**2 / (alpha_t**2 + sigma_t**2)

        dtype = get_module_dtype(self.backbone)

        output = self.backbone(
            (c_in * x_t).astype(dtype),
            c_time,
            y=label,
            key=key,
            **kwargs,
        ).astype(x_t.dtype)

        if self.learn_var:
            output, log_var = jnp.split(output, 2, axis=-1)
            mean = c_skip * x_t + c_out * output
            var = c_var * jnp.exp(log_var)
        else:
            mean = c_skip * x_t + c_out * output
            var = c_var

        if self.clip_mean:
            mean = jnp.clip(mean, min=-1.0, max=1.0)

        return GaussianPosterior(mean=mean, var=var)


def make_model(
    # Denoiser
    clip_mean: bool = True,
    learn_var: bool = True,
    # Discrete schedule
    discrete_schedule: str = "linear",
    discrete_steps: int = 1000,
    # Data
    image_channels: int = 3,
    image_size: int = 64,
    # Backbone
    attention_resolutions: Sequence[int] = (32, 16, 8),
    channel_mult: Sequence[int] = (1, 2, 3, 4),
    num_channels: int = 128,
    num_classes: int | None = None,
    *,
    key: Array | None = None,
    **kwargs,
) -> AblatedDenoiser:
    r"""Initializes an ADM denoiser from card-config hyperparameters
    (reference `adm/__init__.py:164-202`)."""

    if key is None:
        key = jax.random.key(0)

    # Cards list attention *image sizes*; the backbone wants downsample rates
    ds_rates = {image_size // r for r in attention_resolutions}

    backbone = ADMUNet(
        image_size=image_size,
        in_channels=image_channels,
        out_channels=2 * image_channels if learn_var else image_channels,
        model_channels=num_channels,
        channel_mult=tuple(channel_mult),
        num_classes=num_classes,
        attention_resolutions=ds_rates,
        key=key,
        **kwargs,
    )

    return AblatedDenoiser(
        backbone,
        clip_mean=clip_mean,
        learn_var=learn_var,
        discrete_schedule=discrete_schedule,
        discrete_steps=discrete_steps,
    )


def load_model(name: str, dtype=None) -> AblatedDenoiser:
    r"""Loads a pretrained ADM denoiser, converting the PyTorch checkpoint to
    JAX arrays (reference `adm/__init__.py:139-161`).

    Arguments:
        name: The pretrained model name (see `cards.yaml`).
        dtype: Optional dtype to cast the backbone to (e.g. `jnp.bfloat16`).
    """

    from .convert import convert_state_dict
    from ...utils.pytree import load_state_dict

    card = load_cards(__name__)[name]

    path = download(card.url, hash_prefix=card.hash)

    from ..ptread import load_pt

    state = load_pt(path)

    # Skip-init: construct abstractly (no parameter allocation, reference
    # `skip_init`, `adm/__init__.py:156-157`) and fill from the checkpoint
    from ...utils.pytree import filter_eval_shape

    denoiser = filter_eval_shape(make_model, **card.config)

    from ..utils import check_manifest

    check_manifest(state, "adm", name, "model")

    sd = convert_state_dict(denoiser.backbone, state)
    backbone = load_state_dict(denoiser.backbone, sd)

    if dtype is not None:
        backbone = backbone.astype(dtype)

    # The sigma table is not checkpoint data; rebuild it concretely
    config = dict(card.config)
    sigmas = jnp.asarray(
        discrete_sigmas(
            config.get("discrete_schedule", "linear"),
            config.get("discrete_steps", 1000),
        ),
        dtype=jnp.float32,
    )

    return denoiser.tree_replace(backbone=backbone, sigmas=sigmas)
