r"""Parity of the native CLIP text encoder against `transformers.CLIPTextModel`
(a real oracle: transformers constructs randomly-initialized models offline)."""

import jax.numpy as jnp
import numpy as np
import pytest

from azula_tpu.models.clip import CLIPTextEncoder, convert_clip_state_dict
from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)

CONFIGS = {
    "sd1-style-quickgelu": dict(  # noqa: C408
        vocab_size=99,
        hidden=32,
        layers=2,
        heads=4,
        intermediate=64,
        max_positions=16,
        act="quick_gelu",
    ),
    "sd2-style-gelu": dict(  # noqa: C408
        vocab_size=99,
        hidden=48,
        layers=3,
        heads=6,
        intermediate=96,
        max_positions=16,
        act="gelu",
    ),
}


@pytest.mark.parametrize("name", list(CONFIGS), ids=list(CONFIGS))
def test_transformers_parity(name, key):
    import torch

    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CONFIGS[name]

    torch.manual_seed(0)

    theirs = CLIPTextModel(
        CLIPTextConfig(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden"],
            num_hidden_layers=cfg["layers"],
            num_attention_heads=cfg["heads"],
            intermediate_size=cfg["intermediate"],
            max_position_embeddings=cfg["max_positions"],
            hidden_act=cfg["act"],
        )
    )
    theirs.eval()

    ours = filter_eval_shape(CLIPTextEncoder, **cfg, key=key)
    ours = load_state_dict(ours, convert_clip_state_dict(ours, theirs.state_dict()))

    ids = np.random.default_rng(0).integers(0, cfg["vocab_size"], size=(2, 12))

    with torch.no_grad():
        expected = theirs(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()

    out = np.asarray(ours(jnp.asarray(ids)))

    assert np.allclose(out, expected, atol=1e-5), np.abs(out - expected).max()
