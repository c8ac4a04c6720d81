r"""Tests for the CLIP-conditioned cc12m_1 v-diffusion model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sys
import types

from azula_tpu.models.vdm.cc12m import CC12M1Model
from azula_tpu.models.vdm.convert import convert_state_dict
from azula_tpu.utils.pytree import load_state_dict, state_dict

pytestmark = pytest.mark.parity  # golden-parity tier (CI runs it separately)


@pytest.fixture(scope="module")
def reference_cc12m():
    sys.modules.setdefault("gdown", types.ModuleType("gdown"))

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tv_t
        tv_t.functional = tv_f
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.transforms.functional"] = tv_f

    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.vdm._src.cc12m_1 import CC12M1Model as Ref

        yield Ref
    finally:
        sys.path.remove("/root/reference")


def test_state_dict_isomorphism(reference_cc12m, key):
    def rename(k, v):
        if k.endswith(".weight") and v.ndim == 1:
            return k[: -len(".weight")] + ".scale"
        return k

    ref = reference_cc12m()
    ref_sd = {rename(k, v): tuple(v.shape) for k, v in ref.state_dict().items()}

    ours = CC12M1Model(key=key)
    our_sd = {k: v.shape for k, v in state_dict(ours).items()}

    assert set(our_sd) == set(ref_sd), (
        sorted(set(ref_sd) - set(our_sd))[:5],
        sorted(set(our_sd) - set(ref_sd))[:5],
    )

    del ref


def test_forward_parity(reference_cc12m, key):
    import torch

    torch.manual_seed(0)

    ref = reference_cc12m()
    ref.eval()

    ours = CC12M1Model(key=key)
    ours = load_state_dict(ours, convert_state_dict(ref.state_dict()))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    t = np.asarray([0.6], dtype=np.float32)
    clip_embed = rng.normal(size=(1, 512)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.as_tensor(x), torch.as_tensor(t), torch.as_tensor(clip_embed)
        ).numpy()

    out_ours = ours(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t),
        jnp.asarray(clip_embed),
    )

    err = np.abs(np.transpose(out_ref, (0, 2, 3, 1)) - np.asarray(out_ours))

    assert err.max() < 5e-4, err.max()

    del ref, ours
