r"""TPU compute kernels (Pallas) with XLA fallbacks.

The reference delegates its hot ops to third-party CUDA kernels
(`torch.nn.functional.scaled_dot_product_attention` at `azula/nn/attention.py:98-104`,
cuDNN convs, `torch.compile`). Here the equivalents are first-party:

- :func:`~azula_tpu.ops.attention.dot_product_attention` — blockwise Pallas flash
  attention (fp32 accumulation) on TPU, XLA attention elsewhere;
- :func:`~azula_tpu.ops.norm.group_norm` / fused GroupNorm-SiLU.
"""

from . import attention, conv, norm  # noqa: F401
from .attention import dot_product_attention  # noqa: F401
from .conv import conv3x3  # noqa: F401
from .norm import group_norm  # noqa: F401
