r"""Every registry card's architecture constructs (shape-only, via
jax.eval_shape — no parameter allocation, so even the 512px configs are cheap).
"""

import jax
import pytest

from azula_tpu.models import adm, jit, sana, vdm  # noqa: F401  (registers cards.yaml lookups)
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


@pytest.mark.parametrize("name", list(load_cards("azula_tpu.models.sana")))
def test_sana_cards_construct(name):
    r"""Every Sana card's architecture constructs abstractly with a plausible
    parameter count (0.6B / 1.6B / 4.8B; SANA 1.5 adds qk norms)."""

    from azula_tpu.models.sana import _arch
    from azula_tpu.models.sana.backbone import SanaTransformer

    arch = _arch(name)

    shapes = jax.eval_shape(
        lambda: partition(SanaTransformer(**arch, key=jax.random.key(0)))[0]
    )

    n = _n_params(shapes)

    if "4.8b" in name:
        assert 4e9 < n < 5.5e9
    elif "0.6b" in name:
        assert 4e8 < n < 8e8
    else:
        assert 1.2e9 < n < 2e9

    if "1.5" in name:
        assert arch.get("qk_norm"), "SANA 1.5 cards use qk normalization"
