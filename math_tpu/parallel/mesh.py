"""Device-mesh sharding for inference.

TPU-native replacement of the reference's parallel backends (SURVEY.md §2.5):

- TBB thread pool + thread-local tapes  ->  ``vmap`` over chains in one XLA
  program (no tapes to isolate; the program is pure)
- MPI command/serialize/scatter machine (``mpi_parallel_call.hpp``)  ->
  SPMD ``shard_map`` over a named mesh axis; there is no command channel,
  every device runs the same traced program
- ``mpi_parallel_call``'s cached scattered data  ->  device-resident sharded
  arrays placed once (``jax.device_put`` with a ``NamedSharding``)
- warmup statistic pooling / reductions  ->  ``psum``/``pmean`` over ICI

Works identically on a real TPU slice and on the virtual
``--xla_force_host_platform_device_count`` CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from math_tpu.infer.pooled import PooledResult, run_pooled_chains


def chain_mesh(n_devices: Optional[int] = None, axis: str = "chain") -> Mesh:
    """1-D mesh over (up to) all devices for chain data-parallelism."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), (axis,), devices=devs[:n])


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Join a multi-host TPU slice (the boost.mpi `mpi_cluster` successor).

    SPMD needs no command channel: after `jax.distributed.initialize` every
    host sees the global device set and runs the same traced program; mesh
    axes laid out so chain-parallel collectives ride ICI within a slice and
    only warmup-statistic pmeans cross DCN (SURVEY.md §5.8).  Arguments
    default to TPU auto-detection (GCE metadata) when omitted.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.devices()


def sample_nuts_sharded(
    logdensity_fn: Callable,
    key,
    dim: int,
    *,
    args=(),
    num_chains: int,
    num_warmup: int = 1000,
    num_samples: int = 1000,
    max_depth: int = 10,
    target_accept: float = 0.8,
    init_radius: float = 2.0,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
) -> PooledResult:
    """NUTS with chains sharded over the mesh and pooled cross-chain warmup.

    The chain axis is split across devices; each device vmaps its local
    chains; dual-averaging acceptance statistics and Welford metric moments
    ride ``pmean``/``psum`` over the mesh axis, so all chains share one step
    size and one metric — exactly-once cross-chain adaptation semantics
    regardless of device count.
    """
    mesh = mesh if mesh is not None else chain_mesh()
    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    if num_chains % n_dev:
        raise ValueError(f"num_chains={num_chains} not divisible by mesh size {n_dev}")

    key, k_init = jax.random.split(key)
    z0 = jax.random.uniform(
        k_init, (num_chains, dim), minval=-init_radius, maxval=init_radius, dtype=dtype
    )
    keys = jax.random.split(key, num_chains)

    def local(keys_local, z0_local, args_repl):
        return run_pooled_chains(
            keys_local,
            z0_local,
            logdensity_fn,
            args=args_repl,
            num_warmup=num_warmup,
            num_samples=num_samples,
            max_depth=max_depth,
            target_accept=target_accept,
            axis_name=axis,
        )

    out_specs = PooledResult(
        position=P(axis),
        accept_prob=P(axis),
        diverging=P(axis),
        tree_depth=P(axis),
        n_leapfrog=P(axis),
        energy=P(axis),
        step_size=P(),
        inv_mass=P(),
        max_depth=P(),
    )
    run = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), jax.tree.map(lambda _: P(), tuple(args))),
            out_specs=out_specs,
        )
    )
    return run(keys, z0, tuple(args))


def sharded_data_logdensity(
    logdensity_term_fn: Callable,
    data,
    mesh: Mesh,
    axis: str = "obs",
):
    """Observation-sharded log density: the ``map_rect`` successor.

    ``logdensity_term_fn(theta, data_shard) -> scalar`` evaluates the
    likelihood contribution of a shard of observations; shards live on
    separate devices and contributions are summed with ``psum`` (exact,
    since log densities are sums — SURVEY.md §5.7).  Returns
    ``lp(theta) -> scalar`` with theta replicated.

    ``data`` is a pytree whose leaves have the observation axis first; they
    are placed once onto the mesh (the analog of
    ``mpi_parallel_call``'s first-call scatter+cache).
    """
    sharding = NamedSharding(mesh, P(axis))
    data_sharded = jax.tree.map(lambda x: jax.device_put(x, sharding), data)

    def lp(theta):
        def local(theta, shard):
            return jax.lax.psum(logdensity_term_fn(theta, shard), axis)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(),
        )(theta, data_sharded)

    return lp, data_sharded
