r"""Executes the multi-process distributed path for real (SURVEY.md §2.8).

Every multi-device test in the tree runs ONE process with virtual devices;
this worker is launched as N actual processes (CPU backend, 2 local devices
each) and exercises the code that only a real multi-process runtime touches:

1. :func:`azula_tpu.parallel.initialize_distributed` — the
   `jax.distributed.initialize` wrapper — against a live coordinator;
2. :func:`azula_tpu.parallel.mesh.make_hybrid_mesh` over the *global* device
   set (process-major `('replica', 'data', 'model')` layout);
3. a cross-process reduction of a globally-sharded array;
4. a data-parallel loss/gradient step on a real denoiser, with the global
   batch sharded across processes — checked against the same computation on
   one local device.

Usage (each process):

.. code-block:: console

    python tools/multiprocess_check.py <process_id> <num_processes> <coordinator>

Prints ``MULTIPROCESS_OK <psum> <loss>`` on success (asserted identical
across processes by the launcher, `tests/test_multiprocess.py`).
"""

import sys


def main(process_id: int, num_processes: int, coordinator: str) -> None:
    import jax

    # Site customization may pre-import jax; force the platform through
    # config, exactly as tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")

    from azula_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    assert jax.process_count() == num_processes, jax.process_count()

    import numpy as np

    import jax.numpy as jnp

    from jax.sharding import NamedSharding, PartitionSpec as P

    from azula_tpu.parallel.mesh import make_hybrid_mesh

    n = len(jax.devices())
    local = len(jax.local_devices())
    assert n == num_processes * local, (n, local)

    # ('replica', 'data', 'model') with replica = processes: the DCN-outer
    # axis maps across processes, data/model stay process-local.
    mesh = make_hybrid_mesh(model=1)
    assert mesh.axis_names == ("replica", "data", "model")
    assert mesh.devices.shape == (num_processes, local, 1)

    # --- cross-process reduction of a globally-sharded array ---------------
    global_shape = (n, 8)
    value = np.arange(np.prod(global_shape), dtype=np.float32).reshape(global_shape)

    x = jax.make_array_from_callback(
        global_shape,
        NamedSharding(mesh, P(("replica", "data"))),
        lambda idx: value[idx],
    )

    got = float(jax.jit(jnp.sum)(x))
    want = float(value.sum())
    assert abs(got - want) <= 1e-3 * abs(want), (got, want)

    # --- dp loss + gradients across processes vs one local device ---------
    from azula_tpu.denoise import KarrasDenoiser
    from azula_tpu.nn.dit import DiT
    from azula_tpu.nn.embedding import Modulated
    from azula_tpu.noise import VPSchedule
    from azula_tpu.utils.pytree import combine, partition

    key = jax.random.key(0)
    k_model, k_time, k_x, k_t, k_z = jax.random.split(key, 5)

    backbone = Modulated(
        DiT(4, 4, mod_features=16, hid_channels=32, hid_blocks=1,
            attention_heads=2, key=k_model),
        16,
        key=k_time,
    )
    denoiser = KarrasDenoiser(backbone=backbone, schedule=VPSchedule())
    params, static = partition(denoiser)

    B = 2 * n
    x_full = np.asarray(jax.random.normal(k_x, (B, 16, 4)))
    t_full = np.asarray(jax.random.uniform(k_t, (B,)))

    batch_spec = NamedSharding(mesh, P(("replica", "data")))
    replicated = NamedSharding(mesh, P())

    xg = jax.make_array_from_callback((B, 16, 4), batch_spec, lambda i: x_full[i])
    tg = jax.make_array_from_callback((B,), batch_spec, lambda i: t_full[i])
    pg = jax.tree.map(
        lambda leaf: jax.make_array_from_callback(
            np.shape(leaf), replicated, lambda i, leaf=leaf: np.asarray(leaf)[i]
        ),
        params,
    )

    @jax.jit
    def loss_and_gnorm(params, x, t):
        def loss_fn(p):
            return combine(p, static).loss(x, t, key=k_z)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
        )
        return loss, gnorm

    loss, gnorm = loss_and_gnorm(pg, xg, tg)
    loss, gnorm = float(loss), float(gnorm)

    # Reference: identical math on one local device, full batch.
    ref_loss, ref_gnorm = jax.jit(loss_and_gnorm)(
        params, jnp.asarray(x_full), jnp.asarray(t_full)
    )

    assert abs(loss - float(ref_loss)) <= 1e-4 * max(1.0, abs(loss)), (loss, ref_loss)
    assert abs(gnorm - float(ref_gnorm)) <= 1e-3 * max(1.0, abs(gnorm)), (gnorm, ref_gnorm)

    print(f"MULTIPROCESS_OK {got} {loss:.6f}", flush=True)


if __name__ == "__main__":
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    main(pid, nproc, coord)
