r"""Text-to-image sampling with a pretrained latent diffusion family.

The TPU-native equivalent of the reference's pretrained-pipeline usage
(`/root/reference/azula/plugins/sd/__init__.py:226-273` and the README's
pretrained example): load a family with `load_model`, encode a prompt, sample
the latent reverse process with (batched) classifier-free guidance, and decode
to pixels.

Requires network access to download the checkpoint safetensors on first use.

.. code-block:: console

    python examples/text_to_image.py --family sd --prompt "a red panda"
    python examples/text_to_image.py --family sana --steps 20
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--family", choices=("sd", "sana", "flux"), default="sd")
    parser.add_argument("--card", default=None, help="card name (see the family's cards.yaml)")
    parser.add_argument("--prompt", default="a watercolor painting of a lighthouse")
    parser.add_argument("--negative", default="", help="negative prompt (sd/sana)")
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--guidance", type=float, default=5.0)
    parser.add_argument("--size", type=int, default=512, help="output resolution")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="sample.npy")
    args = parser.parse_args()

    from azula_tpu.guidance import CFGDenoiser
    from azula_tpu.sample import DDIMSampler, EulerSampler

    key = jax.random.key(args.seed)

    if args.family == "sd":
        from azula_tpu.models import sd as family

        denoiser, autoencoder, textencoder = family.load_model(args.card or "sd_1.5")

        latent = (1, args.size // 8, args.size // 8, 4)
        positive = textencoder(args.prompt)
        negative = textencoder(args.negative)

        cfg = CFGDenoiser(denoiser, batched=True)
        sampler = DDIMSampler(cfg, steps=args.steps)
        z = sampler(
            sampler.init(key, latent),
            positive=positive,
            negative=negative,
            guidance=args.guidance - 1.0,  # reference scale: omega = cfg_scale - 1
        )
    elif args.family == "sana":
        from azula_tpu.models import sana as family

        denoiser, autoencoder, textencoder = family.load_model(args.card or "sana_0.6b_512")

        latent = (1, args.size // 32, args.size // 32, 32)
        positive = textencoder(args.prompt)
        negative = textencoder(args.negative)

        cfg = CFGDenoiser(denoiser, batched=True)
        sampler = EulerSampler(cfg, steps=args.steps)  # rectified flow
        z = sampler(
            sampler.init(key, latent),
            positive=positive,
            negative=negative,
            guidance=args.guidance - 1.0,
        )
    else:  # flux: guidance-distilled, no CFG
        from azula_tpu.models import flux as family

        denoiser, autoencoder, textencoder = family.load_model(args.card or "flux_1_dev")

        # packed 2x2 latents: (H/16, W/16, 64)
        latent = (1, args.size // 16, args.size // 16, 64)
        prompts = textencoder(args.prompt)

        sampler = EulerSampler(denoiser, steps=args.steps)
        z = sampler(sampler.init(key, latent), guidance=args.guidance, **prompts)

    x = autoencoder.decode(z)

    # all three VAEs decode to pixel values in roughly [-1, 1]
    x = np.asarray(jnp.clip((x + 1) / 2, 0.0, 1.0))

    np.save(args.out, x)
    print(f"saved {x.shape} image array to {args.out}")


if __name__ == "__main__":
    main()
