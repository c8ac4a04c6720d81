r"""Guidance and posterior sampling.

Capability parity with the reference `azula/guidance/` (716 LoC). Two patterns
(reference `guidance/__init__.py:3-11`):

- **denoiser wrappers** that transform the posterior mean (CFG, DiffPIR, JFPS,
  MMPS, TMPD) and forward the inner schedule;
- **sampler subclasses** that modify the reverse step (DPS, PGDM, RePaint, TDS).

The reference's `torch.enable_grad` islands and autograd surfaces
(`dps.py:55-57`, `mmps.py:69-90`) become ordinary :func:`jax.vjp` /
:func:`jax.jvp` closures here — they compose with the compiled sampling scan.
"""

from .cfg import CFGDenoiser  # noqa: F401
from .diffpir import DiffPIRDenoiser  # noqa: F401
from .dps import DPSSampler  # noqa: F401
from .jfps import JFPSDenoiser  # noqa: F401
from .mmps import MMPSDenoiser  # noqa: F401
from .pgdm import PGDMSampler  # noqa: F401
from .repaint import RePaintSampler  # noqa: F401
from .tds import TDSSampler  # noqa: F401
from .tmpd import TMPDenoiser  # noqa: F401
