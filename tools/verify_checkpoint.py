r"""Verifies a downloaded checkpoint against a card's key -> shape manifest.

.. code-block:: console

    PYTHONPATH=. python tools/verify_checkpoint.py sd sd_1.5 unet path/to/model.safetensors
    PYTHONPATH=. python tools/verify_checkpoint.py flux flux_1_dev transformer shard1.safetensors shard2.safetensors

Exit code 0 = the checkpoint matches the manifest; 1 = named key/shape diff
(printed). Accepts one or more `.safetensors` files (shards are merged) or a
torch `.pt`/`.pth` state dict.

NVlabs pickles (`edm`/`eldm` families, `.pkl`) carry their own architecture
hyperparameters, so there is no stored manifest; verification instead
constructs the backbone abstractly from the pickle's metadata and runs the
strict two-way conversion (missing keys raise by name, unconsumed keys fail):

.. code-block:: console

    PYTHONPATH=. python tools/verify_checkpoint.py edm cifar10_32x32 model edm-cifar10-32x32-uncond-ve.pkl

Numerics contract (`--digest` / `--check`): beyond key -> shape, a digest JSON
records per-tensor (mean, std) of the raw checkpoint and — for families with a
self-contained backbone build (adm) — end-to-end denoiser activations on fixed
probe inputs, so real fp16/bf16 weight numerics are pinned, not just topology
(reference load path: `azula/plugins/adm/__init__.py:139-161`):

.. code-block:: console

    PYTHONPATH=. python tools/verify_checkpoint.py adm imagenet_64x64_cond model ckpt.pt --digest digests/adm_64.json
    PYTHONPATH=. python tools/verify_checkpoint.py adm imagenet_64x64_cond model ckpt.pt --check digests/adm_64.json
"""

import sys


def load(paths):
    sd = {}
    for path in paths:
        if path.endswith((".safetensors", ".sft")):
            from safetensors import numpy as st

            sd.update(st.load_file(path))
        else:
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(obj, dict) and "state_dict" in obj:
                obj = obj["state_dict"]
            sd.update(obj)
    return sd


CANONICALIZERS = {
    ("sd", "vae"): ("azula_tpu.models.autoencoder", "canonicalize_vae_keys"),
    ("sd", "text_encoder"): ("azula_tpu.models.clip", "canonicalize_clip_keys"),
    ("flux", "vae"): ("azula_tpu.models.autoencoder", "canonicalize_vae_keys"),
    ("flux", "text_encoder"): ("azula_tpu.models.clip", "canonicalize_clip_keys"),
    ("flux", "text_encoder_2"): ("azula_tpu.models.t5", "canonicalize_t5_keys"),
    ("sana", "text_encoder"): ("azula_tpu.models.gemma", "canonicalize_gemma_keys"),
}


def _build_adm(card_name: str, state) -> tuple:
    r"""Constructs the ADM denoiser from a local state dict (the load_model
    path minus the download), returning (probe_fn, probe_shape)."""

    import jax.numpy as jnp

    from azula_tpu.models.adm import discrete_sigmas, make_model
    from azula_tpu.models.adm.convert import convert_state_dict
    from azula_tpu.models.utils import load_cards
    from azula_tpu.utils.pytree import filter_eval_shape, load_state_dict

    config = dict(load_cards("azula_tpu.models.adm")[card_name].config)

    denoiser = filter_eval_shape(make_model, **config)
    backbone = load_state_dict(
        denoiser.backbone, convert_state_dict(denoiser.backbone, state)
    )
    sigmas = jnp.asarray(
        discrete_sigmas(
            config.get("discrete_schedule", "linear"),
            config.get("discrete_steps", 1000),
        ),
        dtype=jnp.float32,
    )
    denoiser = denoiser.tree_replace(backbone=backbone, sigmas=sigmas)

    size = config.get("image_size", 64)
    label = None
    if config.get("num_classes"):
        label = jnp.zeros((1,), dtype=jnp.int32)

    def probe(x, t):
        return denoiser(x, t, label=label).mean

    return probe, (1, size, size, config.get("image_channels", 3))


def digest_document(family: str, card: str, component: str, sd) -> dict:
    from azula_tpu.models.utils import activation_digest, weight_digest

    doc = {
        "family": family,
        "card": card,
        "component": component,
        "weights": weight_digest(sd),
    }

    if family == "adm" and component == "model":
        probe, shape = _build_adm(card, sd)
        doc["activations"] = activation_digest(probe, {"x": shape})

    return doc


def main() -> int:
    argv = sys.argv[1:]

    digest_out = check_path = None
    if "--digest" in argv:
        i = argv.index("--digest")
        digest_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--check" in argv:
        i = argv.index("--check")
        check_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]

    if len(argv) < 4:
        print(__doc__)
        return 2

    family, card, component, *paths = argv

    if digest_out or check_path:
        import json

        sd = load(paths)
        doc = digest_document(family, card, component, sd)

        if digest_out:
            with open(digest_out, "w") as f:
                json.dump(doc, f, indent=1, sort_keys=True)
            print(f"digest written: {digest_out} ({len(doc['weights'])} tensors"
                  + (f", {len(doc['activations'])} probes)" if "activations" in doc else ")"))
            return 0

        from azula_tpu.models.utils import compare_digests

        with open(check_path) as f:
            want = json.load(f)

        diffs = compare_digests(doc, want)
        if diffs:
            for d in diffs[:20]:
                print(d)
            print(f"digest MISMATCH: {len(diffs)} differences")
            return 1

        print(f"ok: digest matches {check_path}")
        return 0

    if family in ("edm", "eldm"):
        import importlib

        convert = importlib.import_module(f"azula_tpu.models.{family}.convert")
        try:
            module = convert.build_from_pickle(paths[0])
        except (KeyError, AssertionError, ValueError) as e:
            print(e)
            return 1

        import jax

        n = sum(x.size for x in jax.tree.leaves(module) if hasattr(x, "size"))
        print(f"ok: pickle matches its own architecture metadata ({n:,} parameters)")
        return 0

    from azula_tpu.models.utils import check_manifest

    canonicalize = None
    if (family, component) in CANONICALIZERS:
        import importlib

        mod, fn = CANONICALIZERS[(family, component)]
        canonicalize = getattr(importlib.import_module(mod), fn)

    sd = load(paths)

    try:
        check_manifest(sd, family, card, component, canonicalize=canonicalize)
    except ValueError as e:
        print(e)
        return 1

    print(f"ok: {len(sd)} tensors match the {family}/{card} {component} manifest")
    return 0


if __name__ == "__main__":
    sys.exit(main())
