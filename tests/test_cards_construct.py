r"""Every registry card's architecture constructs (shape-only, via
jax.eval_shape — no parameter allocation, so even the 512px configs are cheap).
"""

import jax
import pytest

from azula_tpu.models import adm, jit, vdm  # noqa: F401  (registers cards.yaml lookups)
from azula_tpu.models.utils import load_cards
from azula_tpu.utils.pytree import partition


def _n_params(shapes) -> int:
    return sum(
        leaf.size
        for leaf in jax.tree.leaves(shapes)
        if hasattr(leaf, "size") and hasattr(leaf, "dtype")
    )


@pytest.mark.parametrize("name", list(load_cards("azula_tpu.models.adm")))
def test_adm_cards_construct(name):
    from azula_tpu.models import adm

    card = load_cards("azula_tpu.models.adm")[name]

    shapes = jax.eval_shape(lambda: partition(adm.make_model(**card.config, key=jax.random.key(0)))[0])

    assert _n_params(shapes) > 1e6


@pytest.mark.parametrize("name", list(load_cards("azula_tpu.models.jit")))
def test_jit_cards_construct(name):
    from azula_tpu.models import jit

    card = load_cards("azula_tpu.models.jit")[name]

    shapes = jax.eval_shape(lambda: partition(jit.make_model(**card.config, key=jax.random.key(0)))[0])

    assert _n_params(shapes) > 1e6


@pytest.mark.parametrize("name", list(load_cards("azula_tpu.models.vdm")))
def test_vdm_cards_construct(name):
    from azula_tpu.models import vdm

    card = load_cards("azula_tpu.models.vdm")[name]

    shapes = jax.eval_shape(lambda: partition(vdm.make_model(**card.config, key=jax.random.key(0)))[0])

    assert _n_params(shapes) > 1e6


def test_cc12m_constructs():
    from azula_tpu.models import vdm

    shapes = jax.eval_shape(lambda: partition(vdm.make_model("cc12m_1", key=jax.random.key(0)))[0])

    assert _n_params(shapes) > 1e6
