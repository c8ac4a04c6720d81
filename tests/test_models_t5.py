r"""Parity of the native T5 encoder against `transformers.T5EncoderModel`
(real oracle, random weights, offline)."""

import pytest
import jax.numpy as jnp
import numpy as np

from azula_tpu.models.t5 import T5Encoder, convert_t5_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

CFG = dict(  # noqa: C408
    vocab_size=99,
    dim=32,
    heads=4,
    head_dim=8,
    ff_dim=64,
    layers=3,
)


def test_transformers_parity(key):
    import torch

    from transformers import T5Config, T5EncoderModel

    torch.manual_seed(0)

    theirs = T5EncoderModel(
        T5Config(
            vocab_size=CFG["vocab_size"],
            d_model=CFG["dim"],
            num_heads=CFG["heads"],
            d_kv=CFG["head_dim"],
            d_ff=CFG["ff_dim"],
            num_layers=CFG["layers"],
            feed_forward_proj="gated-gelu",
        )
    )
    theirs.eval()

    ours = filter_eval_shape(T5Encoder, **CFG, key=key)
    ours = load_state_dict(ours, convert_t5_state_dict(ours, theirs.state_dict()))

    ids = np.random.default_rng(0).integers(0, CFG["vocab_size"], size=(2, 11))

    with torch.no_grad():
        expected = theirs(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()

    out = np.asarray(ours(jnp.asarray(ids)))

    assert np.allclose(out, expected, atol=1e-4), np.abs(out - expected).max()
