r"""Structured covariance matrices.

Capability parity with the reference `azula/linalg/covariance.py` (565 LoC): an
algebra of structured covariances (isotropic, diagonal, full-eigen, diagonal ±
low-rank, Kronecker) closed under addition with isotropic terms, scalar scaling,
and inversion (Woodbury).

TPU-first design: every covariance is a :class:`~azula_tpu.utils.pytree.PyTree` —
the structure *types* are static while the factor arrays are dynamic leaves, so
covariance algebra composes with `jit`/`grad`/`vmap` without the reference's
`.to()` device plumbing (`covariance.py:66-79`).
"""

from __future__ import annotations

__all__ = [
    "Covariance",
    "IsotropicCovariance",
    "DiagonalCovariance",
    "FullCovariance",
    "DPLRCovariance",
    "DMLRCovariance",
    "KroneckerCovariance",
]

import abc
import jax.numpy as jnp
import math
import string

from collections.abc import Sequence
from jax import Array

from ..utils.pytree import PyTree


class Covariance(PyTree, abc.ABC):
    r"""Abstract covariance matrix.

    Reference interface: `azula/linalg/covariance.py:24-82`.
    """

    @property
    @abc.abstractmethod
    def shape(self) -> Sequence[int]:
        pass

    @abc.abstractmethod
    def __add__(self, other: Covariance) -> Covariance:
        pass

    def __radd__(self, other: Covariance) -> Covariance:
        return self.__add__(other)

    @abc.abstractmethod
    def __mul__(self, other: Covariance) -> Covariance:
        pass

    def __rmul__(self, other: Covariance) -> Covariance:
        return self.__mul__(other)

    @abc.abstractmethod
    def __matmul__(self, x: Array) -> Array:
        pass

    def __call__(self, x: Array) -> Array:
        return self.__matmul__(x)

    @abc.abstractmethod
    def color(self, x: Array) -> Array:
        r"""Applies a matrix square root :math:`M` (with :math:`M M^\top = C`) to ``x``."""

        pass

    @property
    @abc.abstractmethod
    def inv(self) -> Covariance:
        pass

    @abc.abstractmethod
    def logdet(self) -> Array:
        pass


class IsotropicCovariance(Covariance):
    r"""Isotropic covariance matrix :math:`C = \lambda I`.

    Reference: `azula/linalg/covariance.py:85-134`.
    """

    def __init__(self, lmbda: Array | float) -> None:
        if hasattr(lmbda, "reshape"):
            self.lmbda = lmbda.reshape(())
        else:
            self.lmbda = lmbda

    @property
    def shape(self) -> Sequence[int]:
        raise NotImplementedError("IsotropicCovariance's shape is ambiguous.")

    @staticmethod
    def from_data(X: Array) -> IsotropicCovariance:
        return IsotropicCovariance(jnp.var(X, ddof=1))

    def __add__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return IsotropicCovariance(self.lmbda + other.lmbda)
        else:
            return NotImplemented

    def __mul__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return IsotropicCovariance(self.lmbda * other.lmbda)
        else:
            return NotImplemented

    def __matmul__(self, x: Array) -> Array:
        return self.lmbda * x

    def color(self, x: Array) -> Array:
        if hasattr(self.lmbda, "shape"):
            return jnp.sqrt(self.lmbda) * x
        else:
            return math.sqrt(self.lmbda) * x

    @property
    def inv(self) -> IsotropicCovariance:
        return IsotropicCovariance(1 / self.lmbda)

    def logdet(self) -> Array:
        raise NotImplementedError("IsotropicCovariance's log determinant is ambiguous.")


class DiagonalCovariance(Covariance):
    r"""Diagonal covariance matrix :math:`C = \mathrm{diag}(D)`.

    Reference: `azula/linalg/covariance.py:137-188`.
    """

    def __init__(self, D: Array) -> None:
        self.D = D

    @property
    def shape(self) -> Sequence[int]:
        return self.D.shape

    @staticmethod
    def from_data(X: Array) -> DiagonalCovariance:
        return DiagonalCovariance(jnp.var(X, axis=0, ddof=1))

    def __add__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return DiagonalCovariance(self.D + other.lmbda)
        elif isinstance(other, DiagonalCovariance):
            return DiagonalCovariance(self.D + other.D)
        else:
            return NotImplemented

    def __mul__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return DiagonalCovariance(self.D * other.lmbda)
        elif isinstance(other, DiagonalCovariance):
            return DiagonalCovariance(self.D * other.D)
        else:
            return NotImplemented

    def __matmul__(self, x: Array) -> Array:
        y = x.reshape(-1, *self.shape)
        y = self.D * y
        return y.reshape(x.shape)

    def color(self, x: Array) -> Array:
        y = x.reshape(-1, *self.shape)
        y = jnp.sqrt(self.D) * y
        return y.reshape(x.shape)

    @property
    def inv(self) -> DiagonalCovariance:
        return DiagonalCovariance(1 / self.D)

    def logdet(self) -> Array:
        return jnp.log(self.D).sum()


class FullCovariance(Covariance):
    r"""Full covariance matrix :math:`C = Q \, \mathrm{diag}(L) \, Q^\top` (eigendecomposition).

    Reference: `azula/linalg/covariance.py:191-254`.
    """

    def __init__(self, Q: Array, L: Array) -> None:
        self.Q, self.L = Q, L

    @property
    def shape(self) -> Sequence[int]:
        return self.Q.shape[:-1]

    @staticmethod
    def from_data(X: Array) -> FullCovariance:
        r"""Eigendecomposes the sample covariance of ``X`` (rows = samples).

        Storing the eigenbasis instead of the raw matrix makes :attr:`inv` and
        :meth:`color` O(D²) matvecs with no further factorization.
        """

        count, *event = X.shape
        dim = math.prod(event)

        assert count > dim, "need more samples than features for a full-rank estimate"

        flat = X.reshape(count, dim)
        centered = flat - flat.mean(axis=0)
        L, Q = jnp.linalg.eigh(centered.T @ centered / (count - 1))

        return FullCovariance(Q.reshape(*event, dim), L)

    def __add__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return FullCovariance(self.Q, self.L + other.lmbda)
        else:
            return NotImplemented

    def __mul__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return FullCovariance(self.Q, self.L * other.lmbda)
        else:
            return NotImplemented

    def __matmul__(self, x: Array) -> Array:
        y = x.reshape(-1, *self.shape)
        y = jnp.einsum("...i,n...->ni", self.Q, y)
        y = self.L * y
        y = jnp.einsum("...i,ni->n...", self.Q, y)
        return y.reshape(x.shape)

    def color(self, x: Array) -> Array:
        y = x.reshape(-1, self.Q.shape[-1])
        y = jnp.sqrt(self.L) * y
        y = jnp.einsum("...i,ni->n...", self.Q, y)
        return y.reshape(x.shape)

    @property
    def inv(self) -> FullCovariance:
        return FullCovariance(self.Q, 1 / self.L)

    def logdet(self) -> Array:
        return jnp.log(self.L).sum()


class DPLRCovariance(Covariance):
    r"""Diagonal plus low-rank (DPLR) covariance matrix :math:`\mathrm{diag}(D) + V V^\top`.

    Reference: `azula/linalg/covariance.py:257-395`. Inversion goes through the
    Woodbury identity via the rank-sized capacitance matrix :math:`K`.
    """

    def __init__(self, D: Array, V: Array) -> None:
        self.D, self.V = D, V

    @property
    def shape(self) -> Sequence[int]:
        return self.D.shape

    @property
    def rank(self) -> int:
        return self.V.shape[-1]

    @staticmethod
    def from_data(X: Array, rank: int = 1, iterations: int = 0) -> DPLRCovariance:
        r"""Fits the factor model :math:`x \sim N(\bar x, \mathrm{diag}(D) + VV^\top)`.

        The loadings :math:`V` start from the leading principal subspace of the
        centered data and are optionally refined by factor-analysis
        expectation-maximization with per-feature residual noise.

        Derivation: written from the EM equations in Ghahramani & Hinton,
        *The EM Algorithm for Mixtures of Factor Analyzers* (1996),
        https://mlg.eng.cam.ac.uk/zoubin/papers/tr-96-1.pdf. Functional parity
        target: the reference estimator, `azula/linalg/covariance.py:281-340`.
        """

        count, *event = X.shape
        dim = math.prod(event)

        assert 0 < rank < min(dim, count)

        Y = X.reshape(count, dim)
        Y = Y - Y.mean(axis=0)
        denom = count - 1

        # Leading principal subspace. Eigendecompose whichever Gram matrix —
        # feature-space Yᵀ Y or sample-space Y Yᵀ — is smaller; in the
        # sample-space case the feature-space directions are recovered as
        # normalized data combinations Yᵀ u (they share nonzero eigenvalues).
        if dim <= count:
            evals, evecs = jnp.linalg.eigh(Y.T @ Y / denom)
            top_vals, top_dirs = evals[-rank:], evecs[:, -rank:]
        else:
            evals, evecs = jnp.linalg.eigh(Y @ Y.T / denom)
            top_vals = evals[-rank:]
            top_dirs = Y.T @ evecs[:, -rank:]
            top_dirs = top_dirs / jnp.linalg.norm(top_dirs, axis=0, keepdims=True)

        V = top_dirs * jnp.sqrt(top_vals)
        marginal_var = jnp.var(Y, axis=0, ddof=1)
        D = marginal_var - jnp.square(V).sum(axis=-1)

        # EM refinement. E-step: with C = diag(D) + VVᵀ the latent posterior
        # is z | y ~ N(Vᵀ C⁻¹ y, I − Vᵀ C⁻¹ V) — the Woodbury `inv` above
        # makes Vᵀ C⁻¹ an O(dim·rank) product. M-step: the loadings solve the
        # normal equations E[y zᵀ] = V E[z zᵀ], and the noise floor absorbs
        # the per-feature variance the factors leave unexplained.
        eye = jnp.eye(rank, dtype=Y.dtype)
        for _ in range(iterations):
            proj = DPLRCovariance(D, V).inv(V.T)  # rows of Vᵀ C⁻¹, (rank, dim)
            latent = Y @ proj.T  # posterior means, (count, rank)
            second = eye - proj @ V + latent.T @ latent / denom

            V = jnp.linalg.solve(second.T, latent.T @ Y / denom).T
            D = marginal_var - jnp.einsum("nf,ni,fi->f", Y, latent, V) / denom

        return DPLRCovariance(D.reshape(event), V.reshape(*event, -1))

    def __add__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return DPLRCovariance(self.D + other.lmbda, self.V)
        elif isinstance(other, DiagonalCovariance):
            return DPLRCovariance(self.D + other.D, self.V)
        elif isinstance(other, DPLRCovariance):
            return DPLRCovariance(
                self.D + other.D,
                jnp.concatenate((self.V, other.V), axis=-1),
            )
        else:
            return NotImplemented

    def __mul__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return DPLRCovariance(
                self.D * other.lmbda,
                self.V * jnp.sqrt(other.lmbda),
            )
        else:
            return NotImplemented

    def __matmul__(self, x: Array) -> Array:
        y = x.reshape(-1, *self.shape)
        y = self.D * y + jnp.einsum(
            "...i,ni->n...", self.V, jnp.einsum("...i,n...->ni", self.V, y)
        )
        return y.reshape(x.shape)

    def color(self, x: Array) -> Array:
        W = jnp.einsum("...,...i->...i", jnp.sqrt(1 / self.D), self.V)
        L, Q = jnp.linalg.eigh(jnp.einsum("...i,...j->ij", W, W))
        U = jnp.einsum("...i,ij,j->...j", W, Q, 1 / jnp.sqrt(L))

        y = x.reshape(-1, *self.shape)
        y = y + jnp.einsum(
            "...i,i,ni->n...",
            U,
            jnp.sqrt(1 + L) - 1,
            jnp.einsum("...i,n...->ni", U, y),
        )
        y = jnp.sqrt(self.D) * y

        return y.reshape(x.shape)

    @property
    def K(self) -> Array:
        r"""The capacitance matrix :math:`K = I + V^\top D^{-1} V`."""

        return jnp.eye(self.rank, dtype=self.D.dtype) + jnp.einsum(
            "...i,...,...j->ij",
            self.V,
            1 / self.D,
            self.V,
        )

    @property
    def inv(self) -> DMLRCovariance:
        D = 1 / self.D
        L, Q = jnp.linalg.eigh(self.K)
        V = jnp.einsum("...,...i,ij,j->...j", D, self.V, Q, 1 / jnp.sqrt(L))

        return DMLRCovariance(D, V)

    def logdet(self) -> Array:
        return jnp.log(self.D).sum() + jnp.linalg.slogdet(self.K)[1]


class DMLRCovariance(Covariance):
    r"""Diagonal minus low-rank (DMLR) covariance matrix :math:`\mathrm{diag}(D) - V V^\top`.

    Closed under inverting :class:`DPLRCovariance` and vice versa.
    Reference: `azula/linalg/covariance.py:398-481`.
    """

    def __init__(self, D: Array, V: Array) -> None:
        self.D, self.V = D, V

    @property
    def shape(self) -> Sequence[int]:
        return self.D.shape

    @property
    def rank(self) -> int:
        return self.V.shape[-1]

    def __add__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return DMLRCovariance(self.D + other.lmbda, self.V)
        elif isinstance(other, DiagonalCovariance):
            return DMLRCovariance(self.D + other.D, self.V)
        elif isinstance(other, DMLRCovariance):
            return DMLRCovariance(
                self.D + other.D,
                jnp.concatenate((self.V, other.V), axis=-1),
            )
        else:
            return NotImplemented

    def __mul__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return DMLRCovariance(
                self.D * other.lmbda,
                self.V * jnp.sqrt(other.lmbda),
            )
        else:
            return NotImplemented

    def __matmul__(self, x: Array) -> Array:
        y = x.reshape(-1, *self.shape)
        y = self.D * y - jnp.einsum(
            "...i,ni->n...", self.V, jnp.einsum("...i,n...->ni", self.V, y)
        )
        return y.reshape(x.shape)

    def color(self, x: Array) -> Array:
        W = jnp.einsum("...,...i->...i", jnp.sqrt(1 / self.D), self.V)
        L, Q = jnp.linalg.eigh(jnp.einsum("...i,...j->ij", W, W))
        U = jnp.einsum("...i,ij,j->...j", W, Q, 1 / jnp.sqrt(L))

        y = x.reshape(-1, *self.shape)
        y = y + jnp.einsum(
            "...i,i,ni->n...",
            U,
            jnp.sqrt(1 - L) - 1,
            jnp.einsum("...i,n...->ni", U, y),
        )
        y = jnp.sqrt(self.D) * y

        return y.reshape(x.shape)

    @property
    def K(self) -> Array:
        r"""The capacitance matrix :math:`K = I - V^\top D^{-1} V`."""

        return jnp.eye(self.rank, dtype=self.D.dtype) - jnp.einsum(
            "...i,...,...j->ij",
            self.V,
            1 / self.D,
            self.V,
        )

    @property
    def inv(self) -> DPLRCovariance:
        D = 1 / self.D
        L, Q = jnp.linalg.eigh(self.K)
        V = jnp.einsum("...,...i,ij,j->...j", D, self.V, Q, 1 / jnp.sqrt(L))

        return DPLRCovariance(D, V)

    def logdet(self) -> Array:
        return jnp.log(self.D).sum() + jnp.linalg.slogdet(self.K)[1]


class KroneckerCovariance(Covariance):
    r"""Kronecker-factorized covariance matrix.

    .. math:: C = (Q_1 \otimes \dots \otimes Q_n) \, L \, (Q_1 \otimes \dots \otimes Q_n)^\top

    where the :math:`Q_i` are per-axis orthonormal matrices and the inner
    :math:`L` is itself a (diagonal or DPLR) covariance.

    Reference: `azula/linalg/covariance.py:484-565`.
    """

    def __init__(self, Qs: Sequence[Array], L: Covariance) -> None:
        self.Qs = tuple(Qs)
        self.L = L

    @property
    def shape(self) -> Sequence[int]:
        return tuple(Q.shape[0] for Q in self.Qs)

    @staticmethod
    def from_data(X: Array, rank: int = 0, iterations: int = 0) -> KroneckerCovariance:
        r"""Estimates per-axis eigenbases from the axis-marginal covariances,
        then fits the inner covariance on the data expressed in the joint
        (Kronecker) eigenbasis — diagonal by default, DPLR when ``rank > 0``.
        """

        axis_bases = []
        for axis in range(1, X.ndim):
            flat = jnp.moveaxis(X, axis, -1).reshape(-1, X.shape[axis])
            _, Q = jnp.linalg.eigh(jnp.cov(flat.T))
            axis_bases.append(Q)

        # Rotate the samples into the joint eigenbasis one axis at a time
        # (y = Qᵢᵀ x along each event axis).
        Y = X
        for axis, Q in enumerate(axis_bases, start=1):
            Y = jnp.moveaxis(jnp.moveaxis(Y, axis, -1) @ Q, -1, axis)

        if rank > 0 and len(axis_bases) > 1:
            L = DPLRCovariance.from_data(Y, rank=rank, iterations=iterations)
        else:
            L = DiagonalCovariance.from_data(Y)

        return KroneckerCovariance(axis_bases, L)

    def __add__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return KroneckerCovariance(self.Qs, self.L + other)
        else:
            return NotImplemented

    def __mul__(self, other: Covariance) -> Covariance:
        if isinstance(other, IsotropicCovariance):
            return KroneckerCovariance(self.Qs, self.L * other)
        else:
            return NotImplemented

    def __matmul__(self, x: Array) -> Array:
        y = x.reshape(-1, *self.shape)

        abc = string.ascii_lowercase[: len(self.Qs)]
        ABC = abc.upper()

        y = jnp.einsum(
            f"...{abc},"
            + ",".join(f"{i}{i.upper()}" for i in abc)
            + f"->...{ABC}",
            y,
            *self.Qs,
        )
        y = self.L @ y
        # Synthesis: out[orig] = sum_eig Q[orig, eig] y[eig]  (i.e. Q y)
        y = jnp.einsum(
            f"...{ABC},"
            + ",".join(f"{i}{i.upper()}" for i in abc)
            + f"->...{abc}",
            y,
            *self.Qs,
        )

        return y.reshape(x.shape)

    def color(self, x: Array) -> Array:
        y = x.reshape(-1, *self.shape)

        abc = string.ascii_lowercase[: len(self.Qs)]
        ABC = abc.upper()

        y = self.L.color(y)
        y = jnp.einsum(
            f"...{ABC},"
            + ",".join(f"{i}{i.upper()}" for i in abc)
            + f"->...{abc}",
            y,
            *self.Qs,
        )

        return y.reshape(x.shape)

    @property
    def inv(self) -> KroneckerCovariance:
        return KroneckerCovariance(self.Qs, self.L.inv)

    def logdet(self) -> Array:
        return self.L.logdet()
