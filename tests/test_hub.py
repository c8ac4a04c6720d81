r"""Tests for azula_tpu.hub (mirrors reference tests/test_hub.py:27-66, but
network-free: `file://` URLs exercise the full download/verify/extract path)
and the end-to-end ADM pretrained load path."""

import hashlib
import jax
import jax.numpy as jnp
import pytest
import tarfile

from azula_tpu import hub


@pytest.fixture
def hub_dir(tmp_path):
    old = hub._HUB_DIR
    hub.set_hub_dir(tmp_path / "hub")
    yield tmp_path / "hub"
    hub._HUB_DIR = old


def _make_source(tmp_path, content=b"hello azula"):
    src = tmp_path / "payload.bin"
    src.write_bytes(content)
    return src, f"file://{src}"


def test_download_and_cache(tmp_path, hub_dir):
    src, url = _make_source(tmp_path)

    path = hub.download(url, quiet=True)

    assert path.read_bytes() == b"hello azula"
    assert path.parent == hub_dir

    # Second call hits the cache (deleting the source does not matter)
    src.unlink()
    path2 = hub.download(url, quiet=True)
    assert path2 == path


def test_hash_verification(tmp_path, hub_dir):
    src, url = _make_source(tmp_path)

    digest = hashlib.sha256(b"hello azula").hexdigest()

    hub.download(url, quiet=True, hash_prefix=f"sha256:{digest[:16]}")

    with pytest.raises(RuntimeError, match="hash mismatch"):
        hub.download(url, quiet=True, hash_prefix="sha256:deadbeef")


def test_extract(tmp_path, hub_dir):
    inner = tmp_path / "inner.txt"
    inner.write_text("payload")

    archive = tmp_path / "archive.tar"
    with tarfile.open(archive, "w") as tar:
        tar.add(inner, arcname="inner.txt")

    out = hub.download(f"file://{archive}", quiet=True, extract=True)

    assert out.name.endswith("+x")
    assert (out / "inner.txt").read_text() == "payload"


def test_adm_load_model_end_to_end(tmp_path, hub_dir, monkeypatch):
    r"""Full pretrained path without network: a random torch checkpoint saved
    locally, a patched card, and `adm.load_model` converting it to JAX."""

    torch = pytest.importorskip("torch")

    import sys
    import types

    sys.modules.setdefault("gdown", types.ModuleType("gdown"))
    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.adm._src.unet import UNetModel
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)

    config = dict(  # noqa: C408
        image_size=32,
        num_channels=32,
        num_res_blocks=1,
        channel_mult=[1, 2],
        attention_resolutions=[16],
        num_classes=None,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
        learn_var=True,
        clip_mean=False,
        discrete_schedule="linear",
    )

    ref = UNetModel(
        image_size=32,
        in_channels=3,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions={2},
        channel_mult=(1, 2),
        num_classes=None,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
    )

    ckpt = tmp_path / "model.pt"
    torch.save(ref.state_dict(), ckpt)

    from types import SimpleNamespace

    from azula_tpu.models import adm

    card = SimpleNamespace(url=f"file://{ckpt}", hash=None, config=config)
    monkeypatch.setattr(adm, "load_cards", lambda name: {"tiny": card})

    denoiser = adm.load_model("tiny")

    x_t = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    q = denoiser(x_t, jnp.full((2,), 0.5))

    assert q.mean.shape == x_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    # And with a dtype override
    denoiser16 = adm.load_model("tiny", dtype=jnp.bfloat16)
    q16 = denoiser16(x_t, jnp.full((2,), 0.5))
    assert jnp.all(jnp.isfinite(q16.mean))


def test_verify_checkpoint_digest_roundtrip(tmp_path, monkeypatch):
    r"""Numerics contract (VERDICT r3 #8): the digest machinery pins per-tensor
    weight statistics AND end-to-end probe activations for a converted ADM
    checkpoint — a matching file round-trips, a perturbed weight fails with a
    named diff in both sections."""

    torch = pytest.importorskip("torch")

    import importlib.util
    import json
    import os
    import sys
    import types

    sys.modules.setdefault("gdown", types.ModuleType("gdown"))
    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.adm._src.unet import UNetModel
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)

    config = dict(  # noqa: C408
        image_size=32,
        num_channels=32,
        num_res_blocks=1,
        channel_mult=[1, 2],
        attention_resolutions=[16],
        num_classes=None,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
        learn_var=True,
        clip_mean=False,
        discrete_schedule="linear",
    )

    ref = UNetModel(
        image_size=32,
        in_channels=3,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions={2},
        channel_mult=(1, 2),
        num_classes=None,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
    )

    # Randomize ALL weights: guided-diffusion zero-initializes every residual
    # output conv and the final projection, so a freshly-initialized state
    # dict produces a constant output and probes would be weight-independent.
    gen = torch.Generator().manual_seed(7)
    state = {
        k: torch.randn(v.shape, generator=gen, dtype=v.dtype) * 0.05
        for k, v in ref.state_dict().items()
    }

    ckpt = tmp_path / "model.pt"
    torch.save(state, ckpt)

    from types import SimpleNamespace

    import azula_tpu.models.utils as mutils

    card = SimpleNamespace(url=f"file://{ckpt}", hash=None, config=config)
    monkeypatch.setattr(mutils, "load_cards", lambda name: {"tiny": card})

    spec = importlib.util.spec_from_file_location(
        "verify_checkpoint",
        os.path.join(os.path.dirname(__file__), "..", "tools", "verify_checkpoint.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    digest = tmp_path / "digest.json"

    # Emit
    monkeypatch.setattr(
        sys, "argv",
        ["verify", "adm", "tiny", "model", str(ckpt), "--digest", str(digest)],
    )
    assert cli.main() == 0

    doc = json.loads(digest.read_text())
    assert doc["weights"] and doc["activations"]
    assert all(len(r["proj"]) == 8 for r in doc["activations"])

    # Check passes against the same checkpoint
    monkeypatch.setattr(
        sys, "argv",
        ["verify", "adm", "tiny", "model", str(ckpt), "--check", str(digest)],
    )
    assert cli.main() == 0

    # Perturb one weight: named diffs in BOTH weights and activations
    sd = torch.load(ckpt, weights_only=True)
    name = "input_blocks.0.0.weight"
    assert name in sd
    sd[name] = sd[name] + 0.25
    bad = tmp_path / "bad.pt"
    torch.save(sd, bad)

    doc_bad = cli.digest_document("adm", "tiny", "model", cli.load([str(bad)]))
    diffs = mutils.compare_digests(doc_bad, doc)

    assert any(f"weights[{name}]" in d for d in diffs), diffs
    assert any(d.startswith("activations[") for d in diffs), diffs
