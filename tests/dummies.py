r"""Shared dummy backbones for tests (mirrors the reference's Dummy MLP,
tests/test_denoise.py:22-45): real math, trivial size, with label-routing
assertions."""

import jax

from azula_tpu.nn.layers import Linear, SineEncoding
from azula_tpu.nn.module import Module


class Dummy(Module):
    def __init__(self, features: int = 5, with_label: bool = False, *, key) -> None:
        k1, k2 = jax.random.split(key)

        self.with_label = with_label

        self.l1 = Linear(features, 64, key=k1)
        self.l2 = Linear(64, features, key=k2)

        self.time_encoding = SineEncoding(64)

    def __call__(self, x_t, t, label=None):
        y = self.l1(x_t)
        y = y + self.time_encoding(t)
        y = jax.nn.relu(y)
        y = self.l2(y)

        if self.with_label:
            assert isinstance(label, str)
        else:
            assert label is None

        return y
