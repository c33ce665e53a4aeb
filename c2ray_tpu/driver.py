"""3D main driver: the redshift-slice loop.

Re-implementation of ``code/files_for_3D/C2Ray.F90`` (program C2Ray) and
the 3D times module ``code/time_ini.F90`` (steps per redshift slice,
`set_timesteps` converting redshift intervals to seconds).

The reference's stdin deck + compile-time constants collapse into one
declarative :class:`Run3DConfig`; the init sequence
(C2Ray.F90:103-235) becomes `Run3D.setup`, the redshift loop
(C2Ray.F90:238-380) becomes `Run3D.run`.
"""

import os
import time as _time
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import constants as const
from .cooling import setup_cooling_tables
from .cosmology import CosmoClock, CosmologyParams, DEFAULT_COSMOLOGY
from .grid import CartesianGrid
from .io.checkpoint import save_iterdump
from .io.writers import OutputStreams, OutputWriter
from .material import ClumpingModel, LLSModel, uniform_density_grid
from .nbody import NBodyInterface
from .photonstats import photon_budget, species_inventory
from .radiation.quadrature import build_quadrature_tables
from .radiation.sed import SEDConfig
from .rates import rate_coefficients
from .sources import SourceList
from .state import GridState, initial_grid_state
from .sweep import Evolve3DConfig, SweepConfig, build_shell_table, evolve3d
from .sweep.global_pass import ChemistryConfig


def set_timesteps(clock: CosmoClock, z1, z2, n_steps: int):
    """Convert a redshift interval to an even timestep
    (set_timesteps, time_ini.F90:70-96)."""
    t1 = clock.zred2time(z1)
    t2 = clock.zred2time(z2)
    dt = (t2 - t1) / n_steps
    return float(t1), float(t2), float(dt)


@dataclass
class Run3DConfig:
    """Declarative configuration replacing the reference's stdin deck +
    compile-time parameter modules (SURVEY.md section 5 'Config')."""

    mesh: int
    nbody: NBodyInterface
    sed: SEDConfig
    isothermal: bool = True
    initial_temperature: float = 1.0e4
    steps_per_slice: int = 2          # time_ini.F90:44-61
    outputs_per_slice: int = 1
    clumping: ClumpingModel = field(default_factory=ClumpingModel)
    lls: LLSModel = field(default_factory=LLSModel)
    cosmological: bool = True         # c2ray_parameters.f90:84
    results_dir: str = "./results/"
    dump_dir: str = "./"
    streams: OutputStreams = field(default_factory=OutputStreams)
    dtype: object = jnp.float64
    max_subbox: Optional[int] = None  # c2ray_parameters.f90:52-56
    # iteration-dump cadence in wall-clock seconds (evolve.F90:205-208)
    dump_interval_s: float = 15 * 60.0


class Run3D:
    """A configured 3D simulation."""

    def __init__(self, config: Run3DConfig):
        from .state import canonical_dtype
        config.dtype = canonical_dtype(config.dtype)
        self.config = config
        c = config
        self.grid = CartesianGrid(boxsize_mpc_h=c.nbody.boxsize,
                                  mesh=(c.mesh,) * 3,
                                  h=c.nbody.cosmology.h)

        # rad_ini (C2Ray.F90:136)
        self.tables, self.sed, self.bands = build_quadrature_tables(
            c.sed, isothermal=c.isothermal, dtype=c.dtype)
        cooling = None if c.isothermal else setup_cooling_tables(
            dtype=c.dtype)

        self.clock = CosmoClock.init(c.nbody.cosmology,
                                     float(c.nbody.zred_array[0]))
        self.zfactor_total = 1.0
        # cosmology_init's immediate redshift_evol + cosmo_evol at t=0
        # (cosmology.f90:64-71): lengths go comoving -> proper at z0
        # once, here; densities are set per slice in proper units
        # (dens_ini, mat_ini_test.F90:210-265), so the per-step
        # rescales in _cosmo_evolve_to stay purely incremental.
        dr_proper = self.grid.dr
        if c.cosmological:
            self.clock, zf0, _ = self.clock.redshift_evol(0.0)
            dr_proper = self.grid.dr * zf0
        self.dr_proper = dr_proper
        self.lls = c.lls.initialised(float(c.nbody.zred_array[0]),
                                     dr_proper, c.nbody.cosmology)

        lls_col = (self.lls.coldensh_per_cell()
                   if np.isscalar(self.lls.coldensh_per_cell()) else 0.0)
        sweep_cfg = SweepConfig(
            tables=self.tables, mesh=c.mesh, dr=dr_proper,
            isothermal=c.isothermal, flux_scale=self.bands.flux_scale,
            coldensh_LLS=float(lls_col),
            has_bb=c.sed.bb is not None, has_pl=c.sed.pl is not None,
            has_qso=c.sed.qso is not None)
        # cosmological adiabatic cooling is a *traced* per-step input
        # (run_slice passes 2(dz/dt)/(1+z) into evolve3d), not a config
        # constant
        chem_cfg = ChemistryConfig(
            cooling=cooling, isothermal=c.isothermal,
            isothermal_temperature=c.initial_temperature)
        shells = build_shell_table(c.mesh, c.max_subbox)
        self.evolve_cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem_cfg,
                                         shells=shells)
        # per-radius jitted iterations, cached for the whole run so the
        # adaptive subbox (evolve_source.F90:114-144) compiles each
        # size once
        self._iteration_cache = {}
        self._subbox_radius: Optional[int] = None
        self.writer = OutputWriter(c.results_dir, c.streams,
                                   isothermal=c.isothermal)
        self.state: Optional[GridState] = None
        self.time = 0.0
        self._last_dump = _time.time()

    # -- material ----------------------------------------------------------
    def init_uniform_material(self, z=None):
        """mat_ini + dens_ini for the synthetic test backend
        (mat_ini_test.F90:83-265).  Density is set per slice in `run`."""
        c = self.config
        z = float(c.nbody.zred_array[0]) if z is None else z
        ndens = uniform_density_grid(c.mesh, z, c.nbody.cosmology)
        self.state = initial_grid_state(
            ndens, 0.0, 0.0, 0.0, c.initial_temperature,
            clumping=float(np.mean(c.clumping.at_redshift(z))),
            dtype=c.dtype)

    def set_density(self, ndens):
        """dens_ini from an external (reader-supplied) cube."""
        c = self.config
        nd = jnp.asarray(np.asarray(ndens).reshape(-1), dtype=c.dtype)
        if self.state is None:
            self.state = initial_grid_state(
                ndens, 0.0, 0.0, 0.0, c.initial_temperature, dtype=c.dtype)
        else:
            self.state = self.state._replace(ndens=nd)

    # -- restart -----------------------------------------------------------
    def resume_from_iterdump(self):
        """Reload the most recent iteration dump (start_from_dump,
        evolve.F90:279-367)."""
        from .io.checkpoint import load_iterdump
        from .sweep.source_sweep import RateGrids

        niter, state_np, rates_np = load_iterdump(
            self.config.dump_dir, GridState, RateGrids)
        c = self.config
        self.state = GridState(*[jnp.asarray(x, dtype=c.dtype)
                                 if np.asarray(x).dtype.kind == "f"
                                 else jnp.asarray(x)
                                 for x in state_np])
        return niter

    def restart_from_slice(self, z):
        """Slice restart: read the ionization/temperature output cubes
        back as initial conditions (xfrac_ini/temper_ini,
        mat_ini_test.F90:269-465, C2Ray.F90:219-235)."""
        from .io import read_unformatted_cube
        from .io.writers import _zred_str
        from .material import protect_ionization_fractions

        c = self.config
        base = c.results_dir
        zs = _zred_str(z)
        xh1 = read_unformatted_cube(os.path.join(base, f"xfrac3d_{zs}.bin"),
                                    dtype=np.float64)
        xhe1 = read_unformatted_cube(
            os.path.join(base, f"xfrac3dHe1_{zs}.bin"), dtype=np.float64)
        xhe2 = read_unformatted_cube(
            os.path.join(base, f"xfrac3dHe2_{zs}.bin"), dtype=np.float64)
        xh1, xhe1, xhe2 = protect_ionization_fractions(xh1, xhe1, xhe2)
        temper = c.initial_temperature
        tpath = os.path.join(base, f"Temper3D_{zs}.bin")
        if not c.isothermal and os.path.exists(tpath):
            temper = read_unformatted_cube(tpath, dtype=np.float32)
        ndens = (self.state.ndens if self.state is not None
                 else uniform_density_grid(c.mesh, z, c.nbody.cosmology))
        self.state = initial_grid_state(
            np.asarray(ndens), xh1, xhe1, xhe2, temper, dtype=c.dtype)

    # -- cosmology ---------------------------------------------------------
    def _cosmo_evolve_to(self, t):
        """redshift_evol + cosmo_evol at mid-step (C2Ray.F90:322-325).

        Proper lengths/densities rescale; the grid dr and ndens change.
        """
        self.clock, zfactor, Hz = self.clock.redshift_evol(t)
        if not self.config.cosmological or zfactor == 1.0:
            return
        self.zfactor_total *= zfactor
        zf3 = zfactor**3
        self.state = self.state._replace(ndens=self.state.ndens / zf3)
        self.lls = self.lls.evolve(zfactor)
        # dr changes but is a *traced* input of the jitted iteration
        # (sweep_pyramid_source_batch's dr argument), so no recompile
        # happens per step -- the reference rescales the same state in
        # place (cosmo_evol, cosmology.f90:159-202)
        self.dr_proper *= zfactor

    # -- main loop ---------------------------------------------------------
    def run_slice(self, nz: int, sources: SourceList,
                  ndens: Optional[np.ndarray] = None,
                  write_output=True):
        """Advance through redshift slice nz (C2Ray.F90:238-380)."""
        c = self.config
        zs = c.nbody.zred_array
        z1, z2 = float(zs[nz]), float(zs[nz + 1])
        t1, t2, dt = set_timesteps(self.clock, z1, z2, c.steps_per_slice)

        if ndens is not None:
            self.set_density(ndens)
        elif self.state is None:
            self.init_uniform_material(z1)

        srcpos = jnp.asarray(sources.srcpos, dtype=jnp.int32)
        nflux = jnp.asarray(sources.nflux, dtype=c.dtype)

        vol0 = self.grid.vol
        stats_list = []
        for step in range(c.steps_per_slice):
            t_mid = t1 + (step + 0.5) * dt
            self._cosmo_evolve_to(t_mid)
            vol_now = float(self.dr_proper) ** 3
            before = species_inventory(self.state, vol_now)
            ccf = (self.clock.cosmo_cool_factor()
                   if (c.cosmological and not c.isothermal) else None)
            self.state, stats = evolve3d(
                self.evolve_cfg, self.state, srcpos, nflux, dt,
                dr=float(self.dr_proper),
                cosmo_cool_factor=ccf,
                iteration_cache=self._iteration_cache,
                initial_radius=self._subbox_radius)
            if stats.subbox_radius:
                self._subbox_radius = stats.subbox_radius
            self.time = t1 + (step + 1) * dt
            stats_list.append(stats)

            total_src = self._total_source_rate(sources) * dt
            # the budget's recombination/collision rates use the evolved
            # time-averaged temperature field, not the initial value
            # (photonstatistics.f90:150-203 re-runs
            # ini_rec_colion_factors per cell on temperature_grid slot 1)
            t_for_rates = (jnp.asarray(c.initial_temperature,
                                       dtype=c.dtype)
                           if c.isothermal else self.state.t_av)
            rates = rate_coefficients(t_for_rates)
            budget = photon_budget(before, self.state, rates,
                                   vol_now, dt, total_src)
            self.writer.write_photon_counts(
                budget, stats.photon_loss * self.bands.flux_scale, dt)

            if _time.time() - self._last_dump > c.dump_interval_s:
                from .sweep.source_sweep import zero_rate_grids
                save_iterdump(c.dump_dir, stats.n_iterations, self.state,
                              zero_rate_grids(c.mesh, c.dtype))
                self._last_dump = _time.time()

        if write_output:
            self.write_output(z2, sources)
        return stats_list

    def _total_source_rate(self, sources: SourceList):
        s = 0.0
        if self.sed.bb is not None:
            s += sources.nflux[:, 0].sum() * self.sed.bb.S_star
        if self.sed.pl is not None:
            s += sources.nflux[:, 1].sum() * self.sed.pl.S_star
        if self.sed.qso is not None:
            s += sources.nflux[:, 2].sum() * self.sed.qso.S_star
        return float(s)

    def write_output(self, z, sources: SourceList):
        M = self.config.mesh
        sh = (M, M, M)
        st = self.state
        xh = np.stack([np.asarray(st.h0).reshape(sh),
                       np.asarray(st.h1).reshape(sh)], axis=-1)
        xhe = np.stack([np.asarray(st.he0).reshape(sh),
                        np.asarray(st.he1).reshape(sh),
                        np.asarray(st.he2).reshape(sh)], axis=-1)
        ndens = np.asarray(st.ndens).reshape(sh)
        temper = np.asarray(st.t_final).reshape(sh)
        self.writer.write(z, xh=xh, xhe=xhe, ndens=ndens,
                          temperature=None if self.config.isothermal
                          else temper,
                          srcpos0=sources.srcpos[0]
                          if sources.n_sources else None)
        self.writer.write_mean_ionization(z, xh, xhe, ndens,
                                          self.evolve_cfg.sweep.vol)
