r"""Tests for the pytree module system (azula_tpu.utils.pytree)."""

import jax
import jax.numpy as jnp

from azula_tpu.utils.pytree import (
    PyTree,
    combine,
    load_state_dict,
    partition,
    state_dict,
)

import pytest  # noqa: E402

pytestmark = pytest.mark.smoke  # sub-minute sanity tier (see CONTRIBUTING.md)


class Leaf(PyTree):
    def __init__(self, w):
        self.weight = w
        self.name = "leaf"


class Tree(PyTree):
    def __init__(self, key):
        k1, k2 = jax.random.split(key)
        self.a = Leaf(jax.random.normal(k1, (3, 4)))
        self.blocks = [Leaf(jax.random.normal(k2, (4,))), Leaf(jnp.zeros(2))]
        self.rate = 0.5


def test_flatten_roundtrip(key):
    tree = Tree(key)

    leaves, treedef = jax.tree.flatten(tree)
    rebuilt = jax.tree.unflatten(treedef, leaves)

    assert isinstance(rebuilt, Tree)
    assert jnp.allclose(rebuilt.a.weight, tree.a.weight)
    assert rebuilt.rate == 0.5
    assert rebuilt.blocks[0].name == "leaf"


def test_partition_combine(key):
    tree = Tree(key)

    arrays, static = partition(tree)

    # Only arrays on the dynamic side
    assert all(x is None or isinstance(x, jax.Array) for x in arrays)

    # Static side is hashable (usable as jit static argument)
    assert hash(static) == hash(partition(Tree(key))[1])

    rebuilt = combine(arrays, static)
    assert jnp.allclose(rebuilt.a.weight, tree.a.weight)
    assert rebuilt.rate == 0.5


def test_partition_jit(key):
    tree = Tree(key)
    arrays, static = partition(tree)

    @jax.jit
    def f(arrays):
        t = combine(arrays, static)
        return t.a.weight.sum() + t.blocks[0].weight.sum()

    expected = tree.a.weight.sum() + tree.blocks[0].weight.sum()
    assert jnp.allclose(f(arrays), expected)


def test_grad_through_partition(key):
    tree = Tree(key)
    arrays, static = partition(tree)

    def loss(arrays):
        t = combine(arrays, static)
        return (t.a.weight**2).sum()

    grads = jax.grad(loss)(arrays)
    rebuilt = combine(grads, static)

    assert jnp.allclose(rebuilt.a.weight, 2 * tree.a.weight)


def test_state_dict_roundtrip(key):
    tree = Tree(key)

    sd = state_dict(tree)

    assert "a.weight" in sd
    assert "blocks.0.weight" in sd
    assert "blocks.1.weight" in sd

    other = Tree(jax.random.key(1))
    restored = load_state_dict(other, sd)

    assert jnp.allclose(restored.a.weight, tree.a.weight)
    assert jnp.allclose(restored.blocks[0].weight, tree.blocks[0].weight)


def test_tree_replace(key):
    tree = Tree(key)
    new = tree.tree_replace(rate=0.9)

    assert new.rate == 0.9
    assert tree.rate == 0.5
    assert new.a is tree.a
