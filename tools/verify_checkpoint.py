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


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__)
        return 2

    family, card, component, *paths = sys.argv[1:]

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
