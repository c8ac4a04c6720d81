r"""Offline end-to-end `load_model` tests for the safetensors families.

The real `load_model` bodies run end-to-end — cards lookup, safetensors
reading, eval-shape construction, strict conversion, dtype casts, wrapper
assembly — with the network boundary (hub downloads) and the full-size
architecture tables monkeypatched down to tiny twin-backed configurations.
This executes exactly the glue that the per-component parity tests skip
(reference behavior: `azula/plugins/sd/__init__.py:226-273` and friends).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from types import SimpleNamespace

pytestmark = pytest.mark.parity


def _np_sd(torch_module):
    r"""A torch module's state dict as numpy (the safetensors reader output)."""

    return {
        k: v.detach().contiguous().numpy() for k, v in torch_module.state_dict().items()
    }


class _StubTokenizer(SimpleNamespace):
    def __init__(self, **kwargs):
        super().__init__(model_max_length=77, padding_side="right", **kwargs)


CLIP_TINY = dict(  # noqa: C408
    vocab_size=99,
    hidden=24,
    layers=2,
    heads=4,
    intermediate=48,
    max_positions=16,
    act="quick_gelu",
)


def _tiny_clip_sd():
    import torch

    from transformers import CLIPTextConfig, CLIPTextModel

    torch.manual_seed(1)
    clip = CLIPTextModel(
        CLIPTextConfig(
            vocab_size=CLIP_TINY["vocab_size"],
            hidden_size=CLIP_TINY["hidden"],
            num_hidden_layers=CLIP_TINY["layers"],
            num_attention_heads=CLIP_TINY["heads"],
            intermediate_size=CLIP_TINY["intermediate"],
            max_position_embeddings=CLIP_TINY["max_positions"],
            hidden_act=CLIP_TINY["act"],
        )
    )
    return _np_sd(clip)




def _pin_digest(name, denoiser, probe_fn, shape):
    r"""Wrapper-level numerics pin (VERDICT r4 #2): activation digest on fixed
    probes plus per-tensor stats of the loaded module, compared against the
    committed `digests/<name>.json` artifact — a refactor that changes any
    converted model's outputs (or the wrapper's clip/var/searchsorted
    behavior) fails offline. Regenerate with `AZULA_REGEN_DIGESTS=1`.
    """

    import json
    import os
    import pathlib

    from azula_tpu.models.utils import activation_digest, compare_digests, weight_digest
    from azula_tpu.utils.pytree import state_dict

    doc = {
        "weights": weight_digest(state_dict(denoiser)),
        "activations": activation_digest(probe_fn, {"x": shape}),
    }

    path = pathlib.Path(__file__).parent.parent / "digests" / f"{name}.json"

    if os.environ.get("AZULA_REGEN_DIGESTS"):
        path.parent.mkdir(exist_ok=True)
        path.write_text(json.dumps(doc, indent=0) + "\n")
        return

    assert path.exists(), (
        f"missing committed digest {path}; regenerate with AZULA_REGEN_DIGESTS=1"
    )
    diffs = compare_digests(doc, json.loads(path.read_text()))
    assert not diffs, f"numerics drift vs {path}:\n" + "\n".join(diffs[:12])


@pytest.mark.parametrize("card", ["sd_1.5", "sd_2"], ids=["sd1-eps", "sd2-vpred"])
def test_sd_load_model_offline(card, monkeypatch, tmp_path):
    import torch
    import transformers

    from safetensors.numpy import save_file
    from torch_twins.sd_unet import UNet2DConditionTwin
    from torch_twins.vae import AutoencoderKLTwin

    import azula_tpu.models.autoencoder as ae_mod
    import azula_tpu.models.sd as sd
    import azula_tpu.models.sd.backbone as sd_backbone

    torch.manual_seed(0)

    linear_proj = card == "sd_2"  # the SD2 transformer-projection layout

    unet_cfg = dict(  # noqa: C408
        in_channels=4,
        out_channels=4,
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=24,
        attention_head_dim=2,
        cross_attention_levels=(True, False),
        use_linear_projection=linear_proj,
    )
    vae_cfg = dict(  # noqa: C408
        in_channels=3,
        latent_channels=4,
        block_out_channels=(32, 64),
        layers_per_block=1,
    )

    files = {
        "unet/": _np_sd(UNet2DConditionTwin(**unet_cfg)),
        "vae/": _np_sd(AutoencoderKLTwin(**vae_cfg)),
        "text_encoder/": _tiny_clip_sd(),
    }

    def hub_file(repo, sub):
        for prefix, sd_np in files.items():
            if sub.startswith(prefix):
                path = tmp_path / prefix.strip("/")
                if not path.exists():
                    save_file(sd_np, path)
                return str(path)
        (tmp_path / "tok").write_text("{}")
        return str(tmp_path / "tok")

    monkeypatch.setattr(sd, "_hub_file", hub_file)
    monkeypatch.setattr(sys.modules["transformers"], "CLIPTokenizer", _StubTokenizer)
    tiny_arch = dict(  # noqa: C408
        unet=dict(  # noqa: C408
            cross_attention_dim=24,
            attention_head_dim=2,
            use_linear_projection=linear_proj,
        ),
        clip=CLIP_TINY,
        scale=0.18215,
    )
    monkeypatch.setattr(sd, "ARCHS", {"sd1": tiny_arch, "sd2": tiny_arch})
    monkeypatch.setattr(
        sd_backbone,
        "SDUNet",
        functools.partial(
            sd_backbone.SDUNet,
            in_channels=4,
            out_channels=4,
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_levels=(True, False),
        ),
    )
    monkeypatch.setattr(
        ae_mod, "AutoencoderKL", functools.partial(ae_mod.AutoencoderKL, **vae_cfg)
    )

    # Regenerate the key->shape manifests for the tiny patched arch so the
    # in-path `check_manifest` diff runs for real (not against the full-size
    # packaged manifests).
    import azula_tpu.models.utils as mutils

    mdir = tmp_path / "manifests"
    mutils.generate_manifests("sd", str(mdir))
    monkeypatch.setattr(mutils, "_manifest_dir", lambda: str(mdir))

    denoiser, autoencoder, textencoder = sd.load_model(card, dtype=jnp.float32)
    assert denoiser.prediction == ("velocity" if card == "sd_2" else "epsilon")

    z_t = jax.random.normal(jax.random.key(0), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(1), (1, 7, 24))
    q = denoiser(z_t, jnp.full((2,), 0.4), prompt_embeds=ctx)
    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    _pin_digest(
        f"sd_{card}".replace(".", "_"),
        denoiser,
        lambda x, t: denoiser(x, t, prompt_embeds=ctx).mean,
        (2, 16, 16, 4),
    )

    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 3))
    z = autoencoder.encode(x, key=jax.random.key(3))
    assert autoencoder.decode(z).shape == x.shape

    assert textencoder.tokenizer.model_max_length == 77

    # the full text-to-image flow: CFG-guided DDIM over latents, then decode
    from azula_tpu.guidance import CFGDenoiser
    from azula_tpu.sample import DDIMSampler

    cfg = CFGDenoiser(denoiser, batched=True)
    sampler = DDIMSampler(cfg, steps=4)
    z0 = sampler(
        sampler.init(jax.random.key(4), (1, 16, 16, 4)),
        positive={"prompt_embeds": ctx},
        negative={"prompt_embeds": jnp.zeros_like(ctx)},
        guidance=4.0,
    )
    img = autoencoder.decode(z0)
    assert img.shape == (1, 32, 32, 3)  # the tiny 2-level VAE upsamples 2x
    assert jnp.all(jnp.isfinite(img))


def test_flux_load_model_offline(monkeypatch, tmp_path):
    import torch
    import transformers

    from torch_twins.flux_mmdit import FluxTransformerTwin
    from torch_twins.vae import AutoencoderKLTwin

    import azula_tpu.hub as hub
    import azula_tpu.models.autoencoder as ae_mod
    import azula_tpu.models.clip as clip_mod
    import azula_tpu.models.flux as flux
    import azula_tpu.models.flux.backbone as flux_backbone
    import azula_tpu.models.t5 as t5_mod
    import azula_tpu.models.utils as mutils

    from transformers import T5Config, T5EncoderModel

    torch.manual_seed(0)

    flux_cfg = dict(  # noqa: C408
        in_channels=16,
        num_layers=2,
        num_single_layers=2,
        attention_head_dim=24,
        num_attention_heads=2,
        joint_attention_dim=32,
        pooled_projection_dim=24,
        axes_dims_rope=(8, 8, 8),
    )
    t5_cfg = dict(  # noqa: C408
        vocab_size=99, dim=32, heads=4, head_dim=8, ff_dim=64, layers=2
    )

    t5 = T5EncoderModel(
        T5Config(
            vocab_size=t5_cfg["vocab_size"],
            d_model=t5_cfg["dim"],
            num_heads=t5_cfg["heads"],
            d_kv=t5_cfg["head_dim"],
            d_ff=t5_cfg["ff_dim"],
            num_layers=t5_cfg["layers"],
            feed_forward_proj="gated-gelu",
        )
    )

    sds = {
        "transformer/": _np_sd(FluxTransformerTwin(**flux_cfg, guidance_embeds=True)),
        "vae/": _np_sd(
            AutoencoderKLTwin(
                in_channels=3,
                latent_channels=16,
                block_out_channels=(32, 64),
                layers_per_block=1,
                use_quant_conv=False,
            )
        ),
        "text_encoder/": _tiny_clip_sd(),
        "text_encoder_2/": _np_sd(t5),
    }

    def fake_load(repo, name, variant=None):
        for prefix, sd_np in sds.items():
            if name.startswith(prefix):
                return sd_np
        raise KeyError(name)

    (tmp_path / "tok").write_text("{}")

    monkeypatch.setattr(mutils, "load_hub_safetensors", fake_load)
    monkeypatch.setattr(hub, "download", lambda url, **kw: str(tmp_path / "tok"))
    monkeypatch.setattr(sys.modules["transformers"], "CLIPTokenizer", _StubTokenizer)
    monkeypatch.setattr(sys.modules["transformers"], "T5TokenizerFast", _StubTokenizer)
    monkeypatch.setattr(
        flux_backbone,
        "FluxTransformer",
        functools.partial(flux_backbone.FluxTransformer, **flux_cfg),
    )
    monkeypatch.setattr(
        ae_mod,
        "AutoencoderKL",
        functools.partial(
            ae_mod.AutoencoderKL,
            in_channels=3,
            block_out_channels=(32, 64),
            layers_per_block=1,
        ),
    )
    monkeypatch.setattr(
        clip_mod,
        "CLIPTextEncoder",
        functools.partial(clip_mod.CLIPTextEncoder, **CLIP_TINY),
    )
    monkeypatch.setattr(
        t5_mod, "T5Encoder", functools.partial(t5_mod.T5Encoder, **t5_cfg)
    )

    # Tiny-arch manifests so the in-path check_manifest diff runs for real
    mdir = tmp_path / "manifests"
    mutils.generate_manifests("flux", str(mdir))
    monkeypatch.setattr(mutils, "_manifest_dir", lambda: str(mdir))

    denoiser, autoencoder, textencoder = flux.load_model("flux_1_dev", dtype=jnp.float32)

    # ... and a wrong checkpoint fails loudly with a named diff
    import pytest as _pytest

    broken = dict(sds["transformer/"])
    first = next(iter(broken))
    broken[f"unexpected.{first}"] = broken.pop(first)
    monkeypatch.setattr(
        mutils,
        "load_hub_safetensors",
        lambda repo, name, variant=None: broken
        if name.startswith("transformer/")
        else fake_load(repo, name, variant),
    )
    with _pytest.raises(ValueError, match="manifest"):
        flux.load_model("flux_1_dev", dtype=jnp.float32)
    monkeypatch.setattr(mutils, "load_hub_safetensors", fake_load)

    # packed latent: 4 * 16 = 64 channels per 2x2 patch... here 4 * 4 = 16
    z_t = jax.random.normal(jax.random.key(0), (2, 4, 4, 16))
    clip_pooled = jax.random.normal(jax.random.key(1), (1, 24))
    t5_seq = jax.random.normal(jax.random.key(2), (1, 6, 32))
    q = denoiser(z_t, jnp.full((2,), 0.3), prompt_clip=clip_pooled, prompt_t5=t5_seq)
    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    _pin_digest(
        "flux_1_dev",
        denoiser,
        lambda x, t: denoiser(x, t, prompt_clip=clip_pooled, prompt_t5=t5_seq).mean,
        (2, 4, 4, 16),
    )


@pytest.mark.parametrize(
    "card", ["sana_0.6b_512", "sana_1.5_1.6b_1024"], ids=["sana1", "sana1.5-qknorm"]
)
def test_sana_load_model_offline(card, monkeypatch, tmp_path):
    import torch
    import transformers

    from torch_twins.dc_ae import AutoencoderDCTwin
    from torch_twins.sana_dit import SanaTransformerTwin

    import azula_tpu.hub as hub
    import azula_tpu.models.gemma as gemma_mod
    import azula_tpu.models.sana as sana
    import azula_tpu.models.sana.autoencoder as sana_ae
    import azula_tpu.models.utils as mutils

    from transformers import Gemma2Config, Gemma2Model

    torch.manual_seed(0)

    dit_cfg = dict(  # noqa: C408
        in_channels=8,
        out_channels=8,
        num_attention_heads=4,
        attention_head_dim=8,
        num_cross_attention_heads=2,
        cross_attention_head_dim=16,
        caption_channels=32,
        num_layers=2,
        patch_size=1,
        mlp_ratio=2.5,
        qk_norm="1.5" in card,
    )
    gemma_cfg = dict(  # noqa: C408
        vocab_size=127,
        dim=32,
        layers=2,
        heads=4,
        kv_heads=2,
        head_dim=8,
        intermediate=64,
        query_pre_attn_scalar=8.0,
        attn_logit_softcapping=50.0,
        sliding_window=5,
    )
    dcae_cfg = dict(  # noqa: C408
        in_channels=3,
        latent_channels=8,
        block_types=("ResBlock", "EfficientViTBlock"),
        block_out_channels=(8, 16),
        encoder_layers_per_block=(1, 1),
        decoder_layers_per_block=(1, 1),
        qkv_multiscales=((), (5,)),
        head_dim=4,
    )

    gemma = Gemma2Model(
        Gemma2Config(
            vocab_size=gemma_cfg["vocab_size"],
            hidden_size=gemma_cfg["dim"],
            num_hidden_layers=gemma_cfg["layers"],
            num_attention_heads=gemma_cfg["heads"],
            num_key_value_heads=gemma_cfg["kv_heads"],
            head_dim=gemma_cfg["head_dim"],
            intermediate_size=gemma_cfg["intermediate"],
            query_pre_attn_scalar=gemma_cfg["query_pre_attn_scalar"],
            attn_logit_softcapping=gemma_cfg["attn_logit_softcapping"],
            sliding_window=gemma_cfg["sliding_window"],
            attn_implementation="eager",
        )
    )

    sds = {
        "transformer/": _np_sd(SanaTransformerTwin(**dit_cfg)),
        "text_encoder/": _np_sd(gemma),
        "vae/": _np_sd(AutoencoderDCTwin(**dcae_cfg)),
    }

    def fake_load(repo, name, variant=None):
        for prefix, sd_np in sds.items():
            if name.startswith(prefix):
                return sd_np
        raise KeyError(name)

    (tmp_path / "tok").write_text("{}")

    monkeypatch.setattr(mutils, "load_hub_safetensors", fake_load)
    monkeypatch.setattr(hub, "download", lambda url, **kw: str(tmp_path / "tok"))
    monkeypatch.setattr(sys.modules["transformers"], "GemmaTokenizerFast", _StubTokenizer)
    monkeypatch.setattr(
        sana,
        "ARCHS",
        {"0.6b": dit_cfg, "1.6b": dit_cfg, "1.5-1.6b": dit_cfg, "1.5-4.8b": dit_cfg},
    )
    monkeypatch.setattr(
        gemma_mod,
        "Gemma2TextModel",
        functools.partial(gemma_mod.Gemma2TextModel, **gemma_cfg),
    )
    monkeypatch.setattr(
        sana_ae, "AutoencoderDC", functools.partial(sana_ae.AutoencoderDC, **dcae_cfg)
    )

    # Tiny-arch manifests so the in-path check_manifest diff runs for real
    mdir = tmp_path / "manifests"
    mutils.generate_manifests("sana", str(mdir))
    monkeypatch.setattr(mutils, "_manifest_dir", lambda: str(mdir))

    denoiser, autoencoder, textencoder = sana.load_model(card, dtype=jnp.float32)

    z_t = jax.random.normal(jax.random.key(0), (2, 8, 8, 8))
    ctx = jax.random.normal(jax.random.key(1), (1, 6, 32))
    mask = jnp.ones((1, 6))
    q = denoiser(z_t, jnp.full((2,), 0.4), prompt_embeds=ctx, prompt_mask=mask)
    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    _pin_digest(
        card,
        denoiser,
        lambda x, t: denoiser(x, t, prompt_embeds=ctx, prompt_mask=mask).mean,
        (2, 8, 8, 8),
    )

    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 3))
    z = autoencoder.encode(x)
    assert z.shape == (1, 8, 8, 8)
    assert autoencoder.decode(z).shape == x.shape


def test_edm_load_model_offline(monkeypatch, tmp_path):
    r"""edm.load_model runs end-to-end on a tiny fake NVlabs pickle."""

    import torch

    from test_models_edm import SONG_SMALL, SONG_VARIANTS
    from torch_twins import edm_unet as twin_mod

    import azula_tpu.models.edm as edm

    torch.manual_seed(0)

    cfg = {**SONG_SMALL, **SONG_VARIANTS["ddpmpp"]}
    twin = twin_mod.EDMPrecond(twin_mod.SongUNet(**cfg))
    twin.eval()

    path = tmp_path / "fake-edm.pkl"
    args = (cfg["img_resolution"], cfg["in_channels"], cfg["out_channels"])
    kwargs = {
        k: v
        for k, v in cfg.items()
        if k not in ("img_resolution", "in_channels", "out_channels")
    }
    twin_mod.fake_nvlabs_pickle(path, twin, args, kwargs)

    monkeypatch.setattr(edm, "download", lambda url, **kw: str(path))

    _block_torch(monkeypatch)  # the NVlabs pickle decodes through ptread

    denoiser = edm.load_model("cifar10_32x32", dtype=jnp.float32)

    x_t = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    q = denoiser(x_t, jnp.full((2,), 0.5))
    assert q.mean.shape == x_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    _pin_digest(
        "edm_cifar10",
        denoiser,
        lambda x, t: denoiser(x, t).mean,
        (2, 16, 16, 3),
    )


def test_eldm_load_model_offline(monkeypatch, tmp_path):
    r"""eldm.load_model runs end-to-end: EDM2 pickle with encoder statistics
    plus a tiny VAE checkpoint."""

    import torch

    from safetensors.numpy import save_file
    from test_models_eldm import SMALL as EDM2_SMALL
    from torch_twins import edm2_unet as twin2
    from torch_twins.edm_unet import fake_edm2_pickle
    from torch_twins.vae import AutoencoderKLTwin

    import azula_tpu.models.autoencoder as ae_mod
    import azula_tpu.models.eldm as eldm

    torch.manual_seed(0)

    twin = twin2.Precond(twin2.UNet(**EDM2_SMALL), label_dim=EDM2_SMALL["label_dim"])
    twin.eval()

    pkl = tmp_path / "fake-edm2.pkl"
    args = (
        EDM2_SMALL["img_resolution"],
        EDM2_SMALL["img_channels"],
        EDM2_SMALL["label_dim"],
    )
    kwargs = {
        k: v
        for k, v in EDM2_SMALL.items()
        if k not in ("img_resolution", "img_channels", "label_dim")
    }
    fake_edm2_pickle(pkl, twin, args, kwargs, shift=0.25, scale=2.0)

    vae_cfg = dict(  # noqa: C408
        in_channels=3,
        latent_channels=4,
        block_out_channels=(32, 64),
        layers_per_block=1,
    )
    vae_path = tmp_path / "vae.safetensors"
    save_file(_np_sd(AutoencoderKLTwin(**vae_cfg)), str(vae_path))

    def fake_download(url, **kw):
        return str(vae_path) if "sd-vae" in url else str(pkl)

    monkeypatch.setattr(eldm, "download", fake_download)
    _block_torch(monkeypatch)  # the EDM2 pickle decodes through ptread
    monkeypatch.setattr(
        ae_mod, "AutoencoderKL", functools.partial(ae_mod.AutoencoderKL, **vae_cfg)
    )

    denoiser, autoencoder = eldm.load_model("imagenet_512x512_xs")

    z_t = jax.random.normal(jax.random.key(0), (2, 16, 16, 4))
    q = denoiser(z_t, jnp.full((2,), 0.5), label=jax.nn.one_hot(jnp.asarray([1, 2]), 10))
    assert q.mean.shape == z_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    _pin_digest(
        "eldm_imagenet_512_xs",
        denoiser,
        lambda x, t: denoiser(x, t, label=jax.nn.one_hot(jnp.asarray([1, 2]), 10)).mean,
        (2, 16, 16, 4),
    )

    assert jnp.allclose(autoencoder.shift, 0.25) and jnp.allclose(autoencoder.scale, 2.0)


# ------------------------------------------------------------- .pt families
# The .pt-checkpoint families (adm/jit/vdm, plus the edm NVlabs pickles) load
# through the pure-Python reader (azula_tpu.models.ptread). Torch is POISONED
# in sys.modules during `load_model` to prove the runtime path never imports
# it — the fake checkpoints themselves are written by real torch.save first.


def _block_torch(monkeypatch):
    r"""Makes any `import torch` under the test raise ImportError."""

    monkeypatch.setitem(sys.modules, "torch", None)


def test_adm_load_model_offline_no_torch(monkeypatch, tmp_path):
    import types as _types

    import torch

    sys.modules.setdefault("gdown", _types.ModuleType("gdown"))
    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.adm._src.unet import UNetModel
    finally:
        sys.path.remove("/root/reference")

    import azula_tpu.models.adm as adm
    import azula_tpu.models.utils as mutils

    torch.manual_seed(0)
    ref = UNetModel(
        image_size=32,
        in_channels=3,
        model_channels=32,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions={2},
        channel_mult=(1, 2),
        num_classes=10,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
    )
    path = tmp_path / "fake-adm.pt"
    torch.save(ref.state_dict(), str(path))

    tiny_cfg = dict(  # noqa: C408
        image_size=32,
        num_channels=32,
        num_res_blocks=1,
        channel_mult=[1, 2],
        attention_resolutions=[16],
        num_classes=10,
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
    )
    card = SimpleNamespace(url="http://offline", hash=None, config=tiny_cfg)

    def fake_cards(plugin):
        return {"imagenet_64x64_cond": card}

    monkeypatch.setattr(adm, "load_cards", fake_cards)
    monkeypatch.setattr(mutils, "load_cards", fake_cards)
    monkeypatch.setattr(adm, "download", lambda url, **kw: str(path))

    # Tiny-arch manifests so the in-path check_manifest diff runs for real
    mdir = tmp_path / "manifests"
    mutils.generate_manifests("adm", str(mdir))
    monkeypatch.setattr(mutils, "_manifest_dir", lambda: str(mdir))

    _block_torch(monkeypatch)

    denoiser = adm.load_model("imagenet_64x64_cond", dtype=jnp.bfloat16)

    x_t = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    q = denoiser(x_t, jnp.full((2,), 0.5), label=jnp.asarray([1, 7]))
    assert q.mean.shape == x_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    _pin_digest(
        "adm_imagenet_64_cond",
        denoiser,
        lambda x, t: denoiser(x, t, label=jnp.asarray([1, 7])).mean,
        (2, 32, 32, 3),
    )


def test_jit_load_model_offline_no_torch(monkeypatch, tmp_path):
    import os
    import types as _types

    import torch

    os.environ["TORCHDYNAMO_DISABLE"] = "1"
    sys.modules.setdefault("gdown", _types.ModuleType("gdown"))
    sys.path.insert(0, "/root/reference")
    try:
        from azula.plugins.jit._src.model import JiT as RefJiT
    finally:
        sys.path.remove("/root/reference")

    import azula_tpu.models.jit as jit_mod
    import azula_tpu.models.utils as mutils

    tiny = dict(  # noqa: C408
        input_size=64,
        patch_size=16,
        hidden_size=64,
        depth=3,
        num_heads=4,
        num_classes=10,
        bottleneck_dim=16,
        in_context_len=4,
        in_context_start=1,
    )

    torch.manual_seed(0)
    ref = RefJiT(**tiny)

    archive = tmp_path / "jit"
    archive.mkdir()
    torch.save(
        {"model_ema1": {f"net.{k}": v for k, v in ref.state_dict().items()}},
        str(archive / "checkpoint-last.pth"),
    )

    card = SimpleNamespace(url="http://offline", hash=None, config={"model": "JiT-B/16"})

    def fake_cards(plugin):
        return {"jit_0.1b_16": card}

    monkeypatch.setattr(jit_mod, "load_cards", fake_cards)
    monkeypatch.setattr(mutils, "load_cards", fake_cards)
    monkeypatch.setattr(jit_mod, "JIT_CONFIGS", {"JiT-B/16": tiny})
    monkeypatch.setattr(jit_mod, "download", lambda url, **kw: str(archive))

    mdir = tmp_path / "manifests"
    mutils.generate_manifests("jit", str(mdir))
    monkeypatch.setattr(mutils, "_manifest_dir", lambda: str(mdir))

    _block_torch(monkeypatch)

    denoiser = jit_mod.load_model("jit_0.1b_16", dtype=jnp.bfloat16)

    x_t = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    q = denoiser(x_t, jnp.full((2,), 0.5), label=jnp.asarray([0, 3]))
    assert q.mean.shape == x_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    _pin_digest(
        "jit_0_1b_16",
        denoiser,
        lambda x, t: denoiser(x, t, label=jnp.asarray([0, 3])).mean,
        (2, 64, 64, 3),
    )


def test_vdm_load_model_offline_no_torch(monkeypatch, tmp_path):
    import torch

    import azula_tpu.models.utils as mutils
    import azula_tpu.models.vdm as vdm_mod

    from azula_tpu.models.vdm.backbone import VDMSpec, VDMUNet
    from azula_tpu.utils.pytree import state_dict

    spec = VDMSpec(
        cs=(8, 16),
        blocks=1,
        inner=2,
        attn=(1,),
        head_dim=8,
        final_act=False,
        t_input="log_snr",
        up="nearest",
        std=0.2,
    )

    # The converter's torch->jax mapping, inverted, writes a genuine
    # torch-layout checkpoint from the tiny native module.
    native = VDMUNet(spec, key=jax.random.key(42))

    def to_torch(sd):
        out = {}
        for k, v in sd.items():
            v = np.asarray(v)
            if k.endswith(".scale") and v.ndim == 1:
                k = k[: -len(".scale")] + ".weight"
            elif v.ndim == 4:
                v = np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
            elif (
                v.ndim == 2
                and k.endswith(".weight")
                and not k.endswith("timestep_embed.weight")
            ):
                v = v.T
            out[k] = torch.as_tensor(np.ascontiguousarray(v))
        return out

    path = tmp_path / "fake-vdm.pth"
    torch.save(to_torch(state_dict(native)), str(path))

    card = SimpleNamespace(
        url="http://offline", hash=None, config={"model": "imagenet_128"}
    )

    def fake_cards(plugin):
        return {"imagenet_128x128": card}

    monkeypatch.setattr(vdm_mod, "load_cards", fake_cards)
    monkeypatch.setattr(mutils, "load_cards", fake_cards)
    monkeypatch.setattr(vdm_mod, "SPECS", {"imagenet_128": spec})
    monkeypatch.setattr(vdm_mod, "download", lambda url, **kw: str(path))

    mdir = tmp_path / "manifests"
    mutils.generate_manifests("vdm", str(mdir))
    monkeypatch.setattr(mutils, "_manifest_dir", lambda: str(mdir))

    _block_torch(monkeypatch)

    denoiser = vdm_mod.load_model("imagenet_128x128", dtype=jnp.bfloat16)

    x_t = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    q = denoiser(x_t, jnp.full((2,), 0.5))
    assert q.mean.shape == x_t.shape
    assert jnp.all(jnp.isfinite(q.mean))

    _pin_digest(
        "vdm_imagenet_128",
        denoiser,
        lambda x, t: denoiser(x, t).mean,
        (2, 16, 16, 3),
    )

    # Round-trip: the loaded backbone equals the native source module.
    src = [x for x in jax.tree.leaves(native) if hasattr(x, "shape")]
    got = [x for x in jax.tree.leaves(denoiser.backbone) if hasattr(x, "shape")]
    assert len(src) == len(got)
    assert all(
        np.allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32), atol=1e-2
        )
        for a, b in zip(src, got)
    )
