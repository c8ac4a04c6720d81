r"""Parity of the native Gemma 2 text model against `transformers.Gemma2Model`
(real oracle, random weights, offline)."""

import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.gemma import Gemma2TextModel, convert_gemma_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

CFG = dict(  # noqa: C408
    vocab_size=127,
    dim=32,
    layers=3,  # covers both sliding and global layers
    heads=4,
    kv_heads=2,
    head_dim=8,
    intermediate=64,
    query_pre_attn_scalar=8.0,
    attn_logit_softcapping=50.0,
    sliding_window=5,  # small enough to matter at L=12
)


@pytest.mark.parametrize("masked", [False, True], ids=["unmasked", "padded"])
def test_transformers_parity(masked, key):
    import torch

    from transformers import Gemma2Config, Gemma2Model

    torch.manual_seed(0)

    theirs = Gemma2Model(
        Gemma2Config(
            vocab_size=CFG["vocab_size"],
            hidden_size=CFG["dim"],
            num_hidden_layers=CFG["layers"],
            num_attention_heads=CFG["heads"],
            num_key_value_heads=CFG["kv_heads"],
            head_dim=CFG["head_dim"],
            intermediate_size=CFG["intermediate"],
            query_pre_attn_scalar=CFG["query_pre_attn_scalar"],
            attn_logit_softcapping=CFG["attn_logit_softcapping"],
            sliding_window=CFG["sliding_window"],
            attn_implementation="eager",  # soft-capping requires eager
        )
    )
    theirs.eval()

    ours = filter_eval_shape(Gemma2TextModel, **CFG, key=key)
    ours = load_state_dict(ours, convert_gemma_state_dict(ours, theirs.state_dict()))

    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG["vocab_size"], size=(2, 12))

    mask = None
    if masked:
        mask = np.ones((2, 12), dtype=np.int64)
        mask[0, 9:] = 0  # right padding, as the Sana tokenizer produces

    with torch.no_grad():
        expected = theirs(
            input_ids=torch.as_tensor(ids),
            attention_mask=None if mask is None else torch.as_tensor(mask),
        ).last_hidden_state.numpy()

    out = np.asarray(
        ours(jnp.asarray(ids), None if mask is None else jnp.asarray(mask))
    )

    if masked:
        # padded positions may differ (they attend to nothing); compare valid ones
        out = out[:, :9]
        expected = expected[:, :9]

    assert np.allclose(out, expected, atol=1e-4), np.abs(out - expected).max()
