r"""Pretrained model zoo (the reference's "plugins" layer, `azula/plugins/`).

Each model family ships a denoiser wrapper translating the continuous-time
denoiser API to the checkpoint's native parametrization, a `load_model(name)`
entry point, a `cards.yaml` registry of pretrained checkpoints, and a
PyTorch-to-JAX weight converter.

Available families:

- :mod:`azula_tpu.models.adm` — guided-diffusion / ADM (ImageNet, FFHQ)
"""

from . import utils  # noqa: F401
from .utils import load_cards  # noqa: F401
