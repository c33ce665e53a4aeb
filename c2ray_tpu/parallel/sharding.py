"""SPMD parallelisation over a JAX device mesh.

The TPU-native re-design of the reference's parallel model
(SURVEY.md section 2.5, ``code/files_for_3D/master_slave.F90`` +
``evolve.F90:505-548``):

1. **Source parallelism** (the reference's MPI rank decomposition,
   master_slave.F90:62-95): the source list is sharded over the mesh
   axis; every device traces its sources against the replicated grid
   fields, and the per-device partial rate grids are combined with
   `psum` -- the exact collective analog of the reference's
   MPI_ALLREDUCE(SUM) on phih_grid/phihe_grid/phiheat/photon_loss
   (evolve.F90:505-548).  The reference's dynamic master-slave queue
   (npr > 10) is replaced by deterministic static batching: the sweep
   cost per source is uniform (fixed trace volume), so static
   round-robin is load-balanced by construction on SPMD hardware.

2. **Spatial parallelism for chemistry**: the global pass is
   embarrassingly parallel over cells (evolve.F90:474-484 runs it
   redundantly on every rank!); here the flattened cell axis is sharded
   so each device solves mesh^3/D cells, and only the scalar
   convergence count is psum-reduced.

Collectives ride ICI via `shard_map`; no host transfers occur inside a
timestep.
"""

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..state import GridState
from ..sweep.evolve3d import Evolve3DConfig
from ..sweep.global_pass import global_chemistry_pass
from ..sweep.octant_sweep import sweep_octant_source_batch
from ..sweep.pyramid_sweep import sweep_pyramid_source_batch
from ..sweep.source_sweep import (RateGrids, SourceFields,
                                  sweep_sources_accumulate)

AXIS = "d"


@dataclass(frozen=True)
class ParallelConfig:
    cfg: Evolve3DConfig
    mesh: Mesh  # 1D device mesh over axis AXIS


def pad_sources(srcpos, nflux, n_devices: int):
    """Pad the source list to a multiple of n_devices with zero-flux
    no-op entries (handled inside the sweep)."""
    s = srcpos.shape[0]
    pad = (-s) % n_devices
    if pad:
        srcpos = np.concatenate(
            [srcpos, np.zeros((pad, 3), dtype=srcpos.dtype)], axis=0)
        nflux = np.concatenate(
            [nflux, np.zeros((pad, 3), dtype=nflux.dtype)], axis=0)
    return srcpos, nflux


def make_parallel_iteration(pcfg: ParallelConfig):
    """One jitted sharded {source sweep + global chemistry} iteration.

    Input sharding: grid state replicated for the sweep, sources sharded
    over the device axis; chemistry re-shards the cell axis.
    """
    cfg = pcfg.cfg
    mesh = pcfg.mesh

    full_extent = cfg.shells.lo[0] == -(cfg.sweep.mesh // 2 - 1)
    engine = getattr(cfg, "engine", "pyramid") if full_extent else "shells"
    dense_sweep = {"pyramid": sweep_pyramid_source_batch,
                   "octant": sweep_octant_source_batch}.get(engine)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(AXIS), P(AXIS)),
             out_specs=P())
    def sweep_shard(fields: SourceFields, srcpos, nflux) -> RateGrids:
        if dense_sweep is not None:
            rates = dense_sweep(cfg.sweep, fields, srcpos, nflux)
        else:
            rates = sweep_sources_accumulate(cfg.sweep, cfg.shells,
                                             fields, srcpos, nflux)
        # the reference's MPI_ALLREDUCE(SUM) (evolve.F90:505-548)
        return jax.tree.map(lambda x: jax.lax.psum(x, AXIS), rates)

    rates_spec = RateGrids(phih=P(AXIS), phihe0=P(AXIS), phihe1=P(AXIS),
                           phiheat=P(AXIS), photon_loss=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(P(AXIS), rates_spec, P()),
             out_specs=(P(AXIS), P()))
    def chem_shard(state: GridState, rates: RateGrids, dt):
        new_state, conv = global_chemistry_pass(cfg.chem, state, rates, dt)
        return new_state, jax.lax.psum(conv, AXIS)

    @jax.jit
    def iteration(state: GridState, srcpos, nflux, dt):
        fields = SourceFields(
            ndens=state.ndens,
            h_av0=state.h_av0, h_av1=state.h_av1,
            he_av0=state.he_av0, he_av1=state.he_av1,
        )
        rates = sweep_shard(fields, srcpos, nflux)
        # clumping may be a scalar; broadcast so the cell axis shards
        st = state
        if st.clumping.ndim == 0:
            st = st._replace(clumping=jnp.broadcast_to(
                st.clumping, st.ndens.shape))
        new_state, conv_flag = chem_shard(st, rates, dt)
        return new_state, conv_flag, rates.photon_loss

    return iteration


def parallel_evolve3d(pcfg: ParallelConfig, state: GridState, srcpos,
                      nflux, dt, iteration_fn=None):
    """Sharded evolve3D: same convergence protocol as the single-chip
    path (evolve.F90:147-181)."""
    from ..state import begin_timestep, finish_timestep
    from ..sweep.evolve3d import Evolve3DStats

    if iteration_fn is None:
        iteration_fn = make_parallel_iteration(pcfg)

    n_dev = pcfg.mesh.devices.size
    srcpos, nflux = pad_sources(np.asarray(srcpos), np.asarray(nflux),
                                n_dev)
    srcpos = jnp.asarray(srcpos)
    nflux = jnp.asarray(nflux)

    cfg = pcfg.cfg
    n = state.mesh3
    num_src = int(jnp.sum(jnp.any(nflux > 0, axis=1)))
    conv_criterion = min(int(cfg.convergence_fraction * n), max(num_src, 1))

    state = begin_timestep(state)
    conv_flag, niter, ploss = n, 0, 0.0
    while True:
        if conv_flag < conv_criterion and niter > 1:
            break
        if niter > cfg.max_iterations:
            break
        niter += 1
        state, conv_dev, ploss_dev = iteration_fn(state, srcpos, nflux, dt)
        conv_flag = int(conv_dev)
        ploss = float(ploss_dev)

    state = finish_timestep(state)
    return state, Evolve3DStats(n_iterations=niter, conv_flag=conv_flag,
                                photon_loss=ploss)
