"""Multi-host mesh initialization (SURVEY §5.8 comm backend row).

The reference has no distributed execution at all (4 POSIX threads, one
process); the TPU-native comm backend is `jax.distributed` + XLA
collectives: within a slice the psum in dist_ba rides ICI, across hosts
the same program spans processes and the collectives ride DCN — no NCCL/
MPI translation, the mesh IS the communicator.

Single-host virtual meshes (tests, the driver dryrun) need none of this;
call `initialize_from_env()` once at process start on real multi-host
slices. Standard launchers (GKE/TPU-vm `JAX_COORDINATOR_ADDRESS`,
`JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`) or explicit args both work.
"""
from __future__ import annotations

import os


def initialize_from_env(coordinator: str | None = None,
                        num_processes: int | None = None,
                        process_id: int | None = None) -> bool:
    """jax.distributed.initialize when a multi-process launch is
    configured; returns True if distributed mode was started.

    No-op (False) when neither args nor env vars announce a multi-host
    run, so entry points can call it unconditionally.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else _int_env("JAX_PROCESS_ID")
    if not coordinator or not num_processes:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(num_processes),
                               process_id=int(process_id or 0))
    return True


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v else None


def global_mesh(axis: str = "mp"):
    """1-D mesh over ALL devices of the (possibly multi-host) job —
    hand this to dist_ba; XLA routes the psum over ICI within a slice
    and DCN across hosts."""
    import jax

    from . import dist_ba

    return dist_ba.make_mesh(jax.devices(), axis=axis)


def selftest() -> int:
    """One process's half of the 2-process integration check
    (tests/test_multihost.py spawns two of these on localhost): form the
    cross-process mesh, run one sharded psum, verify the global sum.

    Run directly:
        JAX_COORDINATOR_ADDRESS=127.0.0.1:PORT JAX_NUM_PROCESSES=2 \
        JAX_PROCESS_ID=i python -m ar_orbslam2_tpu.parallel.multihost
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    started = initialize_from_env()
    if not started:
        print("multihost: no coordinator configured (single-process)")
        return 2
    n_proc = jax.process_count()
    n_dev = jax.device_count()
    mesh = global_mesh()
    print(f"multihost: process {jax.process_index()}/{n_proc}, "
          f"{n_dev} global devices, mesh {mesh.shape}")
    # one sharded reduction across the whole job: x_i = i + 1 on global
    # device i; psum must see sum(1..n_dev) on every device
    per = 4
    sharding = NamedSharding(mesh, P("mp"))
    global_shape = (n_dev * per,)
    arrs = [
        jax.device_put(
            np.full(per, 1.0 + d.id, np.float32), d)
        for d in jax.local_devices()
    ]
    x = jax.make_array_from_single_device_arrays(global_shape, sharding,
                                                 arrs)

    @jax.jit
    def total(x):
        return jnp.sum(x)

    got = float(total(x))
    want = per * sum(range(1, n_dev + 1))
    ok = abs(got - want) < 1e-3
    print(f"multihost: psum {got} want {want} -> {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(selftest())
