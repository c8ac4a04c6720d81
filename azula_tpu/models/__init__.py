r"""Pretrained model zoo (the reference's "plugins" layer, `azula/plugins/`).

Each model family ships a denoiser wrapper translating the continuous-time
denoiser API to the checkpoint's native parametrization, a `load_model(name)`
entry point, a `cards.yaml` registry of pretrained checkpoints, and — for
self-contained families — a PyTorch-to-JAX weight converter.

Available families (import lazily, e.g. `from azula_tpu.models import adm`):

- :mod:`azula_tpu.models.adm` — guided-diffusion / ADM (ImageNet, FFHQ);
  native JAX backbone + converter
- :mod:`azula_tpu.models.vdm` — crowsonkb v-diffusion; native JAX backbones
  (declarative spec builder) + converter
- :mod:`azula_tpu.models.jit` — Just image Transformer; native JAX backbone
  + converter
- :mod:`azula_tpu.models.edm` — NVlabs EDM (pickled checkpoints; external repo
  required to deserialize)
- :mod:`azula_tpu.models.eldm` — NVlabs EDM2 latent models
- :mod:`azula_tpu.models.sd` — Stable Diffusion 1.x/2 (diffusers-gated loading)
- :mod:`azula_tpu.models.flux` — Flux.1 (diffusers-gated loading)
- :mod:`azula_tpu.models.sana` — Sana (diffusers-gated loading)
"""

from . import utils  # noqa: F401
from .utils import load_cards  # noqa: F401
