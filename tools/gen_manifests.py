r"""Regenerates the per-card checkpoint manifests (expected source
key -> shape) packaged under `azula_tpu/models/manifests/`.

For every safetensors-based card (sd / flux / sana families, incl. VAE /
DC-AE / CLIP / T5 / Gemma components), constructs the native module abstractly
(`filter_eval_shape`, no weights allocated) and runs the family converter in
*manifest* mode (`Converter(None, ...)` — see
`azula_tpu/models/convert_utils.py`), which records, for each source key the
conversion would consume, the shape the checkpoint tensor must have.

Loaders diff real checkpoints against these manifests before converting
(`azula_tpu.models.utils.check_manifest`), so a wrong or drifted checkpoint
fails with a named key/shape diff instead of a silent mis-load. See
`tools/verify_checkpoint.py` for the standalone checker.

Usage: PYTHONPATH=. python tools/gen_manifests.py [family ...]
"""

import sys


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from azula_tpu.models.utils import generate_manifests

    families = sys.argv[1:] or ["sd", "flux", "sana", "adm", "vdm", "jit"]
    for family in families:
        for path in generate_manifests(family):
            print(path)


if __name__ == "__main__":
    main()
