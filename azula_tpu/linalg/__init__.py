r"""Linear algebra: structured covariances and batched iterative solvers.

Capability parity with the reference `azula/linalg/` (750 LoC): the
:class:`~azula_tpu.linalg.covariance.Covariance` hierarchy and the
fixed-iteration :func:`~azula_tpu.linalg.solve.cg` / :func:`~azula_tpu.linalg.solve.gmres`
solvers, re-designed as JAX pytrees + compiled loops.
"""

from . import covariance, solve  # noqa: F401
from .covariance import (  # noqa: F401
    Covariance,
    DiagonalCovariance,
    DMLRCovariance,
    DPLRCovariance,
    FullCovariance,
    IsotropicCovariance,
    KroneckerCovariance,
)
from .solve import cg, gmres  # noqa: F401
