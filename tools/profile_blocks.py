r"""Per-block timing for the ADM-256 model: times each stage of the real
backbone (input blocks, middle, output blocks) by running progressively longer
prefixes of the forward, so in-context fusion effects are included.

`PYTHONPATH=/root/.axon_site:. python tools/profile_blocks.py`
"""

import time

import jax
import jax.numpy as jnp

B = 8
DT = jnp.bfloat16
RTT = [0.0]


def measure(fn, params, x0, reps, n=3):
    def loop(p, x):
        x, _ = jax.lax.scan(lambda c, _: (fn(p, c), None), x, length=reps)
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(loop)
    float(f(params, x0))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(params, x0))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - RTT[0], 1e-9) / reps


def main():
    key = jax.random.key(0)

    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 128))
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    RTT[0] = min(ts)
    print(f"RTT {RTT[0]*1e3:.1f} ms")

    from azula_tpu.models.adm import make_model
    from azula_tpu.models.utils import load_cards
    from azula_tpu.utils.pytree import combine, partition

    card = load_cards("azula_tpu.models.adm")["imagenet_256x256"]
    denoiser = make_model(**card.config, key=key)
    backbone = denoiser.backbone.astype(DT)

    arrays, static = partition(backbone)

    x0 = jax.random.normal(key, (B, 256, 256, 3), DT)
    t = jnp.full((B,), 500.0)

    # prefix runner: run input blocks 0..k (+middle, +output blocks 0..m),
    # collapse the result back to x0's shape so it chains
    def make_prefix(n_in, with_mid, n_out):
        def fwd(params, x):
            bb = combine(params, static)
            timesteps = jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],))
            from azula_tpu.models.adm.backbone import timestep_embedding

            emb = timestep_embedding(timesteps, bb.model_channels).astype(x.dtype)
            emb = bb.time_embed[1](jax.nn.silu(bb.time_embed[0](emb)))

            hs = []
            h = x
            for i, layers in enumerate(bb.input_blocks[:n_in]):
                if i == 0:
                    h = layers[0](h)
                else:
                    for layer in layers:
                        h = layer(h, emb, key=None)
                hs.append(h)

            if with_mid:
                for layer in bb.middle_block:
                    h = layer(h, emb, key=None)

            for layers in bb.output_blocks[:n_out]:
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                for layer in layers:
                    h = layer(h, emb, key=None)

            # collapse to x0 shape/dtype for chaining
            out = jnp.mean(h.astype(jnp.float32), axis=-1, keepdims=True)
            out = jax.image.resize(out, (B, 256, 256, 1), "nearest")
            return jnp.broadcast_to(out, x.shape).astype(DT) * 1e-6 + x

        return fwd

    n_inputs = len(backbone.input_blocks)
    n_outputs = len(backbone.output_blocks)
    print(f"{n_inputs} input stages, {n_outputs} output stages")

    # checkpoints along the forward
    points = []
    for k in range(0, n_inputs + 1, 3):
        points.append((min(k, n_inputs), False, 0))
    points.append((n_inputs, False, 0))
    points.append((n_inputs, True, 0))
    for m in range(3, n_outputs + 1, 3):
        points.append((n_inputs, True, m))
    points.append((n_inputs, True, n_outputs))

    seen = set()
    prev = 0.0
    for p in points:
        if p in seen:
            continue
        seen.add(p)
        dt = measure(make_prefix(*p), arrays, x0, reps=4)
        print(
            f"in={p[0]:2d} mid={int(p[1])} out={p[2]:2d}: {dt*1e3:7.1f} ms "
            f"(delta {1e3*(dt - prev):+7.1f} ms)"
        )
        prev = dt


if __name__ == "__main__":
    main()
