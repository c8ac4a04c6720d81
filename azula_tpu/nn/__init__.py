r"""Neural network building blocks and backbones.

Capability parity with the reference `azula/nn/` (1261 LoC): common layers,
multi-head self-attention with learned continuous RoPE, UNet, DiT and ViT
backbones — in channels-last (TPU-native) layout, with Pallas kernels behind the
hot paths (see :mod:`azula_tpu.ops`).
"""

from . import module, utils  # noqa: F401
from .module import Module  # noqa: F401
from .utils import get_module_dtype, promote_dtype  # noqa: F401

# Layers and backbones are imported lazily-by-name to keep the core import light.
from .layers import (  # noqa: F401
    ConvNd,
    Dropout,
    LayerNorm,
    Linear,
    Patchify,
    ReLU2,
    RMSNorm,
    SineEncoding,
    SwiGLU,
    Unpatchify,
)
from .attention import MultiheadSelfAttention  # noqa: F401
from .unet import UNet, UNetBlock  # noqa: F401
from .dit import DiT, DiTBlock  # noqa: F401
from .vit import ViT  # noqa: F401
