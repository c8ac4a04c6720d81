r"""Tests for the pure-Python PyTorch checkpoint reader
(:mod:`azula_tpu.models.ptread`): golden round-trips against ``torch.save``
in both serialization formats, dtype coverage, storage views, and the
restricted-global contract (VERDICT r4 #4 — pretrained loading without torch).
"""

import numpy as np
import pickle
import pytest

from azula_tpu.models.ptread import load_pt

pytestmark = pytest.mark.smoke


def _checkpoint():
    import torch

    torch.manual_seed(0)

    t = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    shared = torch.zeros(10)

    return {
        "w": t,
        "wt": t.t(),  # non-contiguous view, shared storage
        "slice": shared[2:7],  # storage view with offset
        "bf16": torch.randn(3, 3).bfloat16(),
        "f16": torch.randn(2, 2).half(),
        "f64": torch.randn(2).double(),
        "i64": torch.arange(5),
        "i32": torch.arange(4, dtype=torch.int32),
        "u8": torch.arange(7, dtype=torch.uint8),
        "b": torch.tensor([True, False, True]),
        "scalar": torch.tensor(3.5),
        "nested": {
            "a": torch.randn(2, 3),
            "n": 7,
            "s": "hello",
            "f": 1.5,
            "lst": [torch.ones(2)],
        },
    }


def _assert_matches(ours, theirs, name="root"):
    import torch

    if isinstance(theirs, torch.Tensor):
        ref = theirs.detach()
        if ref.dtype == torch.bfloat16:
            ref, ours = ref.float(), np.asarray(ours).astype(np.float32)
        assert tuple(np.shape(ours)) == tuple(ref.shape), name
        assert np.array_equal(np.asarray(ours), ref.numpy()), name
    elif isinstance(theirs, dict):
        assert set(ours) == set(theirs), name
        for k in theirs:
            _assert_matches(ours[k], theirs[k], f"{name}.{k}")
    elif isinstance(theirs, list):
        assert len(ours) == len(theirs), name
        for i, (a, b) in enumerate(zip(ours, theirs)):
            _assert_matches(a, b, f"{name}[{i}]")
    else:
        assert ours == theirs, name


@pytest.mark.parametrize("legacy", [False, True], ids=["zip", "legacy"])
def test_round_trip(legacy, tmp_path):
    import torch

    sd = _checkpoint()
    path = tmp_path / "ckpt.pt"
    torch.save(sd, str(path), _use_new_zipfile_serialization=not legacy)

    ours = load_pt(str(path))
    theirs = torch.load(str(path), weights_only=True, map_location="cpu")

    _assert_matches(ours, theirs)


def test_plain_pickled_tensors(tmp_path):
    r"""Tensors plain-pickled outside torch.save embed their storages through
    `torch.storage._load_from_bytes` — the NVlabs checkpoint mechanism."""

    import torch

    path = tmp_path / "plain.pkl"
    obj = {"x": torch.arange(6, dtype=torch.float32).reshape(2, 3), "meta": 3}

    with open(path, "wb") as f:
        pickle.dump(obj, f)

    from azula_tpu.models.ptread import RestrictedUnpickler

    with open(path, "rb") as f:
        ours = RestrictedUnpickler(f).load()

    assert ours["meta"] == 3
    assert np.array_equal(ours["x"], obj["x"].numpy())


def test_disallowed_global_raises(tmp_path):
    import torch

    path = tmp_path / "evil.pt"
    torch.save({"f": print}, str(path))

    with pytest.raises(pickle.UnpicklingError, match="not allowed"):
        load_pt(str(path))
