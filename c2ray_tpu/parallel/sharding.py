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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
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


def make_parallel_iteration(pcfg: ParallelConfig, radius: int = None,
                            return_rates: bool = False,
                            split_chem: bool = None):
    """One sharded {source sweep + global chemistry} iteration.

    Input sharding: grid state replicated for the sweep, sources sharded
    over the device axis; chemistry re-shards the cell axis.

    `radius` (static) bounds the pyramid trace (the expanding-subbox
    mechanism, evolve_source.F90:114-144); `dr`/`vol_over_scale`/
    `cosmo_cool_factor` are traced per-step scalars so cosmological
    runs never recompile (cosmo_evol, cosmology.f90:159-202).
    `return_rates` additionally returns the psum-reduced RateGrids for
    the mid-iteration checkpoint path (evolve.F90:233-275).

    `split_chem` lifts the chemistry fixed-point loop OUT of the fused
    sharded program: the sweep stays one jitted shard_map, then the
    host drives one jitted *cell-sharded* chemistry trip per iteration
    (global_pass host_loop).  REQUIRED for non-isothermal runs on real
    TPUs: an in-graph while_loop holding both doric and thermal
    miscompiles to a device kernel fault (round-3 bisect; see
    _do_chemistry_global).  The chemistry is elementwise over cells, so
    jit with P(AXIS)-sharded inputs preserves the spatial distribution
    without shard_map -- only the convergence count crosses devices.
    Auto: on for heating on a TPU backend, off otherwise (CPU tests pin
    both paths equal).
    """
    cfg = pcfg.cfg
    mesh = pcfg.mesh
    if split_chem is None:
        split_chem = (not cfg.chem.isothermal
                      and jax.default_backend() == "tpu")

    full_extent = cfg.shells.lo[0] == -(cfg.sweep.mesh // 2 - 1)
    engine = getattr(cfg, "engine", "pyramid") if full_extent else "shells"

    def _sweep(fields: SourceFields, srcpos, nflux, dr,
               vol_over_scale, lls_grid) -> RateGrids:
        if engine == "pyramid":
            rates = sweep_pyramid_source_batch(
                cfg.sweep, fields, srcpos, nflux, radius=radius,
                dr=dr, vol_over_scale=vol_over_scale,
                lls_grid=lls_grid)
        elif engine == "octant":
            rates = sweep_octant_source_batch(cfg.sweep, fields,
                                              srcpos, nflux)
        else:
            rates = sweep_sources_accumulate(cfg.sweep, cfg.shells,
                                             fields, srcpos, nflux)
        # the reference's MPI_ALLREDUCE(SUM) (evolve.F90:505-548)
        return jax.tree.map(lambda x: jax.lax.psum(x, AXIS), rates)

    def _sweep_shard(with_lls):
        return partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(AXIS), P(AXIS), P(), P(),
                      P() if with_lls else None),
            out_specs=P())(_sweep)

    sweep_plain = _sweep_shard(False)
    sweep_lls = _sweep_shard(True)

    rates_spec = RateGrids(phih=P(AXIS), phihe0=P(AXIS), phihe1=P(AXIS),
                           phiheat=P(AXIS), photon_loss=P(),
                           lls_loss=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(P(AXIS), rates_spec, P(), P()),
             out_specs=(P(AXIS), P()))
    def chem_shard(state: GridState, rates: RateGrids, dt,
                   cosmo_cool_factor):
        new_state, conv = global_chemistry_pass(cfg.chem, state, rates,
                                                dt, cosmo_cool_factor)
        return new_state, jax.lax.psum(conv, AXIS)

    def _defaults(state, dr, vol_over_scale, cosmo_cool_factor):
        dtype = state.ndens.dtype
        if dr is None:
            dr = jnp.asarray(cfg.sweep.dr, dtype=dtype)
            vol_over_scale = jnp.asarray(
                cfg.sweep.vol / cfg.sweep.flux_scale, dtype=dtype)
        if cosmo_cool_factor is None:
            cosmo_cool_factor = jnp.asarray(cfg.chem.cosmo_cool_factor,
                                            dtype=dtype)
        return dr, vol_over_scale, cosmo_cool_factor

    def _run_sweep(state, srcpos, nflux, dr, vol_over_scale, lls_grid):
        fields = SourceFields(
            ndens=state.ndens,
            h_av0=state.h_av0, h_av1=state.h_av1,
            he_av0=state.he_av0, he_av1=state.he_av1,
        )
        sweep_fn = sweep_plain if lls_grid is None else sweep_lls
        return sweep_fn(fields, srcpos, nflux, dr, vol_over_scale,
                        lls_grid)

    if split_chem:
        sweep_jit = jax.jit(_run_sweep)
        cell_sharding = NamedSharding(mesh, P(AXIS))

        def iteration(state: GridState, srcpos, nflux, dt, dr=None,
                      vol_over_scale=None, cosmo_cool_factor=None,
                      lls_grid=None):
            dr, vol_over_scale, ccf = _defaults(
                state, dr, vol_over_scale, cosmo_cool_factor)
            rates = sweep_jit(state, srcpos, nflux, dr, vol_over_scale,
                              lls_grid)
            st = state
            if st.clumping.ndim == 0:
                st = st._replace(clumping=jnp.broadcast_to(
                    st.clumping, st.ndens.shape))
            # shard the cell axis for the chemistry loop: each device
            # solves mesh^3/D cells; elementwise ops preserve the
            # layout, the trip's convergence count reduces globally
            shard_cells = lambda x: jax.device_put(x, cell_sharding)
            st = jax.tree.map(shard_cells, st)
            rates_c = rates._replace(
                phih=shard_cells(rates.phih),
                phihe0=shard_cells(rates.phihe0),
                phihe1=shard_cells(rates.phihe1),
                phiheat=shard_cells(rates.phiheat))
            new_state, conv_flag = global_chemistry_pass(
                cfg.chem, st, rates_c, dt, ccf, host_loop=True)
            if return_rates:
                return (new_state, conv_flag, rates.photon_loss,
                        rates.lls_loss, rates)
            return (new_state, conv_flag, rates.photon_loss,
                    rates.lls_loss)

        return iteration

    @jax.jit
    def iteration(state: GridState, srcpos, nflux, dt, dr=None,
                  vol_over_scale=None, cosmo_cool_factor=None,
                  lls_grid=None):
        dr, vol_over_scale, cosmo_cool_factor = _defaults(
            state, dr, vol_over_scale, cosmo_cool_factor)
        rates = _run_sweep(state, srcpos, nflux, dr, vol_over_scale,
                           lls_grid)
        # clumping may be a scalar; broadcast so the cell axis shards
        st = state
        if st.clumping.ndim == 0:
            st = st._replace(clumping=jnp.broadcast_to(
                st.clumping, st.ndens.shape))
        new_state, conv_flag = chem_shard(st, rates, dt,
                                          cosmo_cool_factor)
        if return_rates:
            return (new_state, conv_flag, rates.photon_loss,
                    rates.lls_loss, rates)
        return (new_state, conv_flag, rates.photon_loss,
                rates.lls_loss)

    return iteration


def parallel_evolve3d(pcfg: ParallelConfig, state: GridState, srcpos,
                      nflux, dt, iteration_fn=None, dr=None,
                      cosmo_cool_factor=None, iteration_cache=None,
                      initial_radius=None, lls_grid=None,
                      dump_dir=None, dump_interval_s=900.0,
                      start_from_dump=False, split_chem=None):
    """Sharded evolve3D: same convergence protocol as the single-chip
    path (evolve.F90:147-181), including the adaptive expanding subbox
    (evolve_source.F90:114-144) and traced per-step `dr` /
    `cosmo_cool_factor` so cosmological runs never recompile.

    `dump_dir` / `start_from_dump` give the multi-device path the same
    mid-iteration checkpoint protocol as the single-chip evolve3d
    (evolve.F90:199-212, 279-367): dumps are written from the gathered
    host arrays in the same format, so they are portable across
    single-chip, source-parallel and domain runs."""
    import time as _time

    from ..state import begin_timestep, finish_timestep
    from ..sweep.evolve3d import (Evolve3DStats, _scaled_source_strength,
                                  _subbox_radii)

    cfg = pcfg.cfg
    n_dev = pcfg.mesh.devices.size
    if iteration_fn is not None and dump_dir is not None:
        raise ValueError(
            "dump_dir requires the internally-built iteration "
            "(return_rates=True); pass dump_dir OR iteration_fn, not "
            "both")
    srcpos, nflux = pad_sources(np.asarray(srcpos), np.asarray(nflux),
                                n_dev)
    srcpos = jnp.asarray(srcpos)
    nflux = jnp.asarray(nflux)

    adaptive = (iteration_fn is None and cfg.use_subbox
                and cfg.engine == "pyramid"
                and cfg.shells.lo[0] == -(cfg.sweep.mesh // 2 - 1))
    if iteration_cache is None:
        iteration_cache = {}
    want_rates = dump_dir is not None
    if adaptive:
        radii = _subbox_radii(cfg)

        def iteration_at(r):
            key = (r, want_rates, split_chem)
            if key not in iteration_cache:
                iteration_cache[key] = make_parallel_iteration(
                    pcfg, radius=None if r == radii[-1] else r,
                    return_rates=want_rates, split_chem=split_chem)
            return iteration_cache[key]

        total_strength = _scaled_source_strength(cfg.sweep, nflux)
        loss_wall = cfg.min_fraction_of_photons * max(total_strength,
                                                      1e-300)
        r_idx = 0
        if initial_radius is not None:
            while (r_idx + 1 < len(radii)
                   and radii[r_idx] < initial_radius):
                r_idx += 1
    elif iteration_fn is None:
        key = ("full", want_rates, split_chem)
        if key not in iteration_cache:
            iteration_cache[key] = make_parallel_iteration(
                pcfg, return_rates=want_rates, split_chem=split_chem)
        iteration_fn = iteration_cache[key]

    n = state.mesh3
    num_src = int(jnp.sum(jnp.any(nflux > 0, axis=1)))
    conv_criterion = min(int(cfg.convergence_fraction * n), max(num_src, 1))

    resume_niter = 0
    resume_conv = None
    if start_from_dump:
        from ..io.checkpoint import load_iterdump
        from ..sweep.global_pass import global_chemistry_pass as _gcp

        resume_niter, st_np, rt_np, meta = load_iterdump(
            dump_dir, GridState, RateGrids, with_meta=True)
        dtype = state.ndens.dtype
        rstate = GridState(*[jnp.asarray(x, dtype=dtype)
                             for x in st_np])
        rrates = RateGrids(*[None if x is None else jnp.asarray(x, dtype=dtype)
                             for x in rt_np])
        ccf = (None if cosmo_cool_factor is None
               else jnp.asarray(float(cosmo_cool_factor)))
        state, conv_dev = _gcp(cfg.chem, rstate, rrates,
                               jnp.asarray(dt), ccf)
        resume_conv = int(conv_dev)
        if adaptive and meta.get("subbox_radius"):
            r_sub = int(meta["subbox_radius"])
            while (r_idx + 1 < len(radii) and radii[r_idx] < r_sub):
                r_idx += 1
    else:
        state = begin_timestep(state)
    conv_flag = n if resume_conv is None else resume_conv
    niter, ploss, lls_loss = resume_niter, 0.0, 0.0
    radius_used = 0
    last_dump = _time.time()
    while True:
        if conv_flag < conv_criterion and niter > 1:
            break
        if niter > cfg.max_iterations:
            break
        niter += 1
        kw = {}
        if dr is not None:
            drf = float(dr)
            kw = {"dr": jnp.asarray(drf),
                  "vol_over_scale": jnp.asarray(
                      drf ** 3 / cfg.sweep.flux_scale)}
        if cosmo_cool_factor is not None:
            kw["cosmo_cool_factor"] = jnp.asarray(
                float(cosmo_cool_factor))
        if lls_grid is not None:
            kw["lls_grid"] = lls_grid
        prev_state = state
        if adaptive:
            while True:
                out = iteration_at(radii[r_idx])(state, srcpos, nflux,
                                                 dt, **kw)
                if (r_idx + 1 >= len(radii)
                        or float(out[2]) <= loss_wall):
                    break
                r_idx += 1
            radius_used = radii[r_idx]
        else:
            out = iteration_fn(state, srcpos, nflux, dt, **kw)
        state, conv_dev, ploss_dev, lls_dev = out[:4]
        conv_flag = int(conv_dev)
        ploss = float(ploss_dev)
        lls_loss = float(lls_dev)

        if want_rates and _time.time() - last_dump >= dump_interval_s:
            from ..io.checkpoint import save_iterdump

            save_iterdump(dump_dir, niter, prev_state, out[4],
                          subbox_radius=radius_used)
            last_dump = _time.time()

    state = finish_timestep(state)
    return state, Evolve3DStats(n_iterations=niter, conv_flag=conv_flag,
                                photon_loss=ploss,
                                subbox_radius=radius_used,
                                lls_loss=lls_loss)
