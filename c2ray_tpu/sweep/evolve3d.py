"""The 3D multi-source timestep: iterate {sweep all sources, apply rates}
until the grid converges.

Re-implementation of ``evolve3D`` (evolve.F90:78-229): the convergence
loop runs at the Python level (its trip count is physical, data
dependent and small), while each iteration -- the full source sweep plus
the global chemistry pass -- is one jitted XLA program.
"""

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..state import GridState, begin_timestep, finish_timestep
from .geometry import ShellTable
from .global_pass import ChemistryConfig, global_chemistry_pass
from .octant_sweep import sweep_octant_source_batch
from .pyramid_sweep import sweep_pyramid_source_batch
from .source_sweep import (RateGrids, SourceFields, SweepConfig,
                           sweep_sources_accumulate)

# c2ray_parameters.f90:26 and evolve.F90:147,177
CONVERGENCE_FRACTION = 2.5e-4
MAX_GLOBAL_ITER = 500


@dataclass(frozen=True)
class Evolve3DConfig:
    sweep: SweepConfig
    chem: ChemistryConfig
    shells: ShellTable
    convergence_fraction: float = CONVERGENCE_FRACTION
    max_iterations: int = MAX_GLOBAL_ITER
    # "pyramid": dominant-axis pyramid engine (each cell evaluated
    # once; fastest on TPU; requires an even cubic mesh);
    # "octant": dense skewed-octant engine (gather-free, ~3x redundant
    # plane evaluations, same mesh requirement);
    # "shells": sparse L1-shell engine (general extents / max_subbox)
    engine: str = "pyramid"


class Evolve3DStats(NamedTuple):
    n_iterations: int
    conv_flag: int
    photon_loss: float


def make_evolve3d_iteration(cfg: Evolve3DConfig):
    """One jitted {sweep + global pass} iteration."""

    # pyramid/octant require the full periodic trace extents
    # (+M/2 / -(M/2-1)); fall back to the shell engine otherwise
    full_extent = cfg.shells.lo[0] == -(cfg.sweep.mesh // 2 - 1)
    engine = cfg.engine if full_extent else "shells"
    dense_sweep = {"pyramid": sweep_pyramid_source_batch,
                   "octant": sweep_octant_source_batch}.get(engine)

    @jax.jit
    def iteration(state: GridState, srcpos, nflux, dt):
        fields = SourceFields(
            ndens=state.ndens,
            h_av0=state.h_av0, h_av1=state.h_av1,
            he_av0=state.he_av0, he_av1=state.he_av1,
        )
        if dense_sweep is not None:
            rates = dense_sweep(cfg.sweep, fields, srcpos, nflux)
        else:
            rates = sweep_sources_accumulate(cfg.sweep, cfg.shells,
                                             fields, srcpos, nflux)
        new_state, conv_flag = global_chemistry_pass(cfg.chem, state,
                                                     rates, dt)
        return new_state, conv_flag, rates.photon_loss

    return iteration


def evolve3d(cfg: Evolve3DConfig, state: GridState, srcpos, nflux, dt,
             iteration_fn=None):
    """Full evolve3D (evolve.F90:78-229).

    srcpos: (S, 3) int32; nflux: (S, 3) float.  Returns
    (new state, Evolve3DStats).
    """
    if iteration_fn is None:
        iteration_fn = make_evolve3d_iteration(cfg)

    n = state.mesh3
    num_src = int(srcpos.shape[0])
    conv_criterion = min(int(cfg.convergence_fraction * n), num_src)

    state = begin_timestep(state)
    conv_flag = n
    niter = 0
    ploss = 0.0
    while True:
        # convergence test at loop head (evolve.F90:154-182); require at
        # least two iterations so sources can interact
        if conv_flag < conv_criterion and niter > 1:
            break
        if niter > cfg.max_iterations:
            break
        niter += 1
        state, conv_flag_dev, ploss_dev = iteration_fn(state, srcpos,
                                                       nflux, dt)
        conv_flag = int(conv_flag_dev)
        ploss = float(ploss_dev)

    state = finish_timestep(state)
    return state, Evolve3DStats(n_iterations=niter, conv_flag=conv_flag,
                                photon_loss=ploss)
