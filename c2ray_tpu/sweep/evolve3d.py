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


# evolve_source.F90:133-144: keep growing the subbox while more than
# this fraction of the sources' photons escapes it
MIN_FRACTION_OF_PHOTONS = 1.0e-10


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
    # expanding-subbox trace (evolve_source.F90:114-144; pyramid engine
    # only): start at subbox_start cells, double while the escaping
    # photon fraction exceeds min_fraction_of_photons, capped at M/2.
    # The reference grows per source in steps of subboxsize=10
    # (c2ray_parameters.f90:51-56); here the radius is shared by the
    # source batch and grows dyadically so each size compiles once.
    use_subbox: bool = True
    subbox_start: int = 8
    min_fraction_of_photons: float = MIN_FRACTION_OF_PHOTONS
    # recycle escaped photons into the grid (the reference's DISABLED
    # 7-band hook, completed over all 47 bands -- see
    # sweep/photon_losses.py).  Requires the pyramid engine with
    # sweep.track_band_loss=True.  The reported photon_loss stays the
    # raw escape (it still drives the expanding subbox and the photon
    # budget, photonstatistics.f90:272-318).
    add_photon_losses: bool = False


class Evolve3DStats(NamedTuple):
    n_iterations: int
    conv_flag: int
    photon_loss: float
    subbox_radius: int = 0
    # photons/s absorbed in LLSs during the last iteration
    # (photonstatistics.f90:59; enters the conservation budget as
    # LLS_loss*dt, photonstatistics.f90:281)
    lls_loss: float = 0.0


def _scaled_source_strength(sweep_cfg: SweepConfig, nflux) -> float:
    """Total photon rate of the batch in the sweep's scaled flux units
    (sum over source types of NormFlux * type rate / flux_scale)."""
    from ..radiation.quadrature import QuadTables

    t = sweep_cfg.tables
    total = 0.0
    if isinstance(t, QuadTables):
        cols = ((t.bb, 0), (t.pl, 1), (t.qso, 2))
        for sq, j in cols:
            if sq is None:
                continue
            from ..radiation.quadrature import SourceQuad
            blocks = (sq,) if isinstance(sq, SourceQuad) else sq
            a_sum = sum(float(jnp.sum(b.A_photo)) for b in blocks)
            total += a_sum * float(jnp.sum(nflux[:, j]))
    else:
        total = float(jnp.sum(nflux))
    return total


def _subbox_radii(cfg: Evolve3DConfig):
    R = cfg.sweep.mesh // 2
    radii = []
    r = cfg.subbox_start
    while r < R:
        radii.append(r)
        r *= 2
    radii.append(R)
    return radii


def make_evolve3d_iteration(cfg: Evolve3DConfig, radius=None,
                            return_rates=False):
    """One jitted {sweep + global pass} iteration.

    `radius` (static) bounds the pyramid engine's trace; None = full.
    `return_rates` additionally returns the accumulated RateGrids --
    used by the mid-iteration checkpoint path (the reference dumps the
    rate grids inside the convergence loop, evolve.F90:233-275).
    """

    # pyramid/octant require the full periodic trace extents
    # (+M/2 / -(M/2-1)); fall back to the shell engine otherwise
    full_extent = cfg.shells.lo[0] == -(cfg.sweep.mesh // 2 - 1)
    engine = cfg.engine if full_extent else "shells"
    dense_sweep = {"pyramid": sweep_pyramid_source_batch,
                   "octant": sweep_octant_source_batch}.get(engine)

    if cfg.add_photon_losses and not (
            engine == "pyramid" and cfg.sweep.track_band_loss):
        raise ValueError(
            "add_photon_losses needs the pyramid engine with "
            "SweepConfig(track_band_loss=True)")

    def _sweep(state: GridState, srcpos, nflux, dr, vol_over_scale,
               lls_grid):
        fields = SourceFields(
            ndens=state.ndens,
            h_av0=state.h_av0, h_av1=state.h_av1,
            he_av0=state.he_av0, he_av1=state.he_av1,
        )
        if engine == "pyramid":
            rates = sweep_pyramid_source_batch(
                cfg.sweep, fields, srcpos, nflux, radius=radius,
                dr=dr, vol_over_scale=vol_over_scale, lls_grid=lls_grid)
            if cfg.add_photon_losses:
                from .photon_losses import distribute_photon_losses

                vos = (vol_over_scale if vol_over_scale is not None
                       else jnp.asarray(
                           cfg.sweep.vol / cfg.sweep.flux_scale,
                           dtype=fields.ndens.dtype))
                rates = distribute_photon_losses(cfg.sweep.tables,
                                                 rates, fields, vos)
            return rates
        elif dense_sweep is not None:
            return dense_sweep(cfg.sweep, fields, srcpos, nflux)
        return sweep_sources_accumulate(cfg.sweep, cfg.shells,
                                        fields, srcpos, nflux)

    # On TPU the iteration is ALWAYS split into {jitted sweep} +
    # {chemistry}:
    # - heating: the chemistry runs as a host-level loop (an in-graph
    #   while_loop holding both doric and thermal faults -- see
    #   _do_chemistry_global's host_loop contract);
    # - big isothermal grids (>= 2^24 cells): host loop too -- the
    #   fused in-graph fixed point runs every cell through every
    #   iteration (no compaction), 5-10x the compacting host loop's
    #   cost at 256^3 (tools/profile_256.py);
    # - small isothermal: host loop as well -- the in-graph lockstep
    #   pass is bimodal (an easy pass converges in ~5 iterations at
    #   ~0.03 s, but evolved states can tip a cell minority into the
    #   >1% oscillation regime and the whole grid then runs toward
    #   the 400 cap: 0.75 s measured at 128^3; round-5 bench bisect),
    #   while the compacting host loop pays only for the active set.
    # CPU keeps the single fused program.
    split_chem = jax.default_backend() == "tpu"
    iso_in_graph = False

    if split_chem:
        sweep_jit = jax.jit(_sweep)
        chem_jit = jax.jit(lambda st, rt, dt_, ccf: global_chemistry_pass(
            cfg.chem, st, rt, dt_, ccf, host_loop=False))

        def iteration(state: GridState, srcpos, nflux, dt, dr=None,
                      vol_over_scale=None, cosmo_cool_factor=None,
                      lls_grid=None):
            dtype = state.ndens.dtype
            if dr is None:
                dr = jnp.asarray(cfg.sweep.dr, dtype=dtype)
                vol_over_scale = jnp.asarray(
                    cfg.sweep.vol / cfg.sweep.flux_scale, dtype=dtype)
            rates = sweep_jit(state, srcpos, nflux, dr, vol_over_scale,
                              lls_grid)
            if iso_in_graph:
                ccf = (jnp.asarray(cfg.chem.cosmo_cool_factor,
                                   dtype=dtype)
                       if cosmo_cool_factor is None
                       else cosmo_cool_factor)
                new_state, conv_flag = chem_jit(state, rates, dt, ccf)
            else:
                new_state, conv_flag = global_chemistry_pass(
                    cfg.chem, state, rates, dt, cosmo_cool_factor,
                    host_loop=True)
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
        rates = _sweep(state, srcpos, nflux, dr, vol_over_scale,
                       lls_grid)
        new_state, conv_flag = global_chemistry_pass(
            cfg.chem, state, rates, dt, cosmo_cool_factor)
        if return_rates:
            return (new_state, conv_flag, rates.photon_loss,
                    rates.lls_loss, rates)
        return new_state, conv_flag, rates.photon_loss, rates.lls_loss

    return iteration


def evolve3d(cfg: Evolve3DConfig, state: GridState, srcpos, nflux, dt,
             iteration_fn=None, dr=None, cosmo_cool_factor=None,
             iteration_cache=None, initial_radius=None, lls_grid=None,
             dump_dir=None, dump_interval_s=900.0,
             start_from_dump=False):
    """Full evolve3D (evolve.F90:78-229).

    srcpos: (S, 3) int32; nflux: (S, 3) float.  Returns
    (new state, Evolve3DStats).

    `dr` (optional float) overrides the sweep's static cell size as a
    *traced* input -- the cosmological driver rescales it every step
    without recompiling (both the scalar and its host-computed
    dr^3/flux_scale companion are passed through).

    `cosmo_cool_factor` (optional float) is the per-step adiabatic
    cooling factor 2(dz/dt)/(1+z) (cosmology.f90:207-234,
    thermal.f90:76), also passed traced.

    With `cfg.use_subbox` (pyramid engine) each iteration's sweep runs
    on an adaptive subbox radius: if the photon fraction escaping the
    current radius exceeds `min_fraction_of_photons`, the radius is
    doubled and the sweep redone (evolve_source.F90:114-144); the
    converged radius carries over to the next iteration.

    `iteration_cache` (optional dict) holds the jitted per-radius
    iteration functions across calls -- long-lived drivers pass one so
    each subbox size compiles once per run, not once per timestep.
    `initial_radius` seeds the adaptive radius (e.g. the previous
    step's converged radius).

    `dump_dir` enables the reference's mid-iteration checkpoints:
    every `dump_interval_s` wall seconds, the pre-iteration state +
    that iteration's rate grids are written to alternating iterdump
    slots (evolve.F90:199-212, 233-275).  `start_from_dump=True`
    resumes mid-timestep: the dumped rates are re-applied with one
    global chemistry pass and the convergence loop continues from the
    dumped iteration count (start_from_dump, evolve.F90:279-367;
    driver plumbing C2Ray.F90:191-216).
    """
    import time as _time

    if iteration_fn is not None and dump_dir is not None:
        # the dump path reads out[4] (the rate grids), which only an
        # iteration built with return_rates=True provides
        raise ValueError(
            "dump_dir requires the internally-built iteration "
            "(return_rates=True); pass dump_dir OR iteration_fn, not "
            "both")
    adaptive = (iteration_fn is None and cfg.use_subbox
                and cfg.engine == "pyramid"
                and cfg.shells.lo[0] == -(cfg.sweep.mesh // 2 - 1))
    if iteration_cache is None:
        iteration_cache = {}
    want_rates = dump_dir is not None

    def _make(r):
        return make_evolve3d_iteration(cfg, radius=r,
                                       return_rates=want_rates)

    if adaptive:
        radii = _subbox_radii(cfg)

        def iteration_at(r):
            key = (r, "rates") if want_rates else r
            if key not in iteration_cache:
                iteration_cache[key] = _make(
                    None if r == radii[-1] else r)
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
        key = ("full", "rates") if want_rates else "full"
        if key not in iteration_cache:
            iteration_cache[key] = _make(None)
        iteration_fn = iteration_cache[key]

    n = state.mesh3
    num_src = int(srcpos.shape[0])
    conv_criterion = min(int(cfg.convergence_fraction * n), num_src)

    resume_niter = 0
    resume_conv = None
    if start_from_dump:
        # mid-timestep resume: restore the pre-iteration state + rates,
        # re-apply the chemistry pass (evolve.F90:137-141)
        from ..io.checkpoint import load_iterdump
        from ..state import GridState

        resume_niter, st_np, rt_np, meta = load_iterdump(
            dump_dir, GridState, RateGrids, with_meta=True)
        dtype = state.ndens.dtype
        state = GridState(*[jnp.asarray(x, dtype=dtype)
                            for x in st_np])
        rates = RateGrids(*[None if x is None
                            else jnp.asarray(x, dtype=dtype)
                            for x in rt_np])
        ccf = (None if cosmo_cool_factor is None
               else jnp.asarray(float(cosmo_cool_factor)))
        state, conv_dev = global_chemistry_pass(cfg.chem, state, rates,
                                                jnp.asarray(dt), ccf)
        resume_conv = int(conv_dev)
        if adaptive and meta.get("subbox_radius"):
            r_sub = int(meta["subbox_radius"])
            while (r_idx + 1 < len(radii) and radii[r_idx] < r_sub):
                r_idx += 1
    else:
        state = begin_timestep(state)
    conv_flag = n if resume_conv is None else resume_conv
    niter = resume_niter
    ploss = 0.0
    lls_loss = 0.0
    radius_used = 0
    last_dump = _time.time()
    while True:
        # convergence test at loop head (evolve.F90:154-182); require at
        # least two iterations so sources can interact
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
        state, conv_flag_dev, ploss_dev, lls_dev = out[:4]
        conv_flag = int(conv_flag_dev)
        ploss = float(ploss_dev)
        lls_loss = float(lls_dev)

        # mid-iteration checkpoint (write_iteration_dump,
        # evolve.F90:199-212): the pre-iteration state + this
        # iteration's rates fully determine the post-iteration state
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
