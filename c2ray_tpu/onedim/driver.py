"""1D program driver: init + time loop.

Re-implementation of ``code/files_for_1D/C2Ray.F90`` (program C2Ray, 1D)
and the 1D times module ``code/time.F90`` (end time + N equal steps).
"""

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..cooling import setup_cooling_tables
from ..cosmology import CosmoClock
from ..grid import RadialGrid
from ..radiation.bands import make_bands
from ..radiation.quadrature import build_quadrature_tables
from ..radiation.sed import SEDConfig
from ..radiation.tables import build_radiation_tables
from .evolve import OneDContext, State1D, make_evolve1d
from .material import OneDProblem, init_material


@dataclass
class OneDRun:
    """A configured 1D simulation (grid + material + radiation)."""

    problem: OneDProblem
    grid: RadialGrid
    sed: SEDConfig
    ctx: OneDContext = None
    state: State1D = None
    clock: Optional[CosmoClock] = None
    time: float = 0.0
    _step_fn: object = None

    @classmethod
    def setup(cls, problem: OneDProblem, grid: RadialGrid, sed: SEDConfig,
              nbnd2: int = 26, nbnd3: int = 20,
              dtype=jnp.float64, use_quadrature: bool = True) -> "OneDRun":
        """Init sequence (files_for_1D/C2Ray.F90:70-125).

        ``use_quadrature``: evaluate band integrals with the gather-free
        exponential-sum rule (more accurate than the reference's
        tau-table interpolation); False selects the table path for
        reference-parity studies.
        """
        bands = make_bands(nbnd2, nbnd3)
        build = (build_quadrature_tables if use_quadrature
                 else build_radiation_tables)
        tables, sed_norm, bands = build(
            sed, bands, isothermal=problem.isothermal, dtype=dtype)
        cooling = (None if problem.isothermal
                   else setup_cooling_tables(dtype=dtype))

        ndens, temper, xh, xhe = init_material(problem, grid)

        clock = None
        cosmo_cool_factor = 0.0
        if problem.testnum == 4:
            clock = CosmoClock.init(problem.cosmology, problem.zred00)
            clock, zfactor, _ = clock.redshift_evol(0.0)
            # comoving -> proper: lengths shrink by 1/(1+z), density grows
            ndens = ndens / zfactor**3
            grid = RadialGrid(r_in=grid.r_in * zfactor,
                              r_out=grid.r_out * zfactor, mesh=grid.mesh)
            cosmo_cool_factor = float(clock.cosmo_cool_rate(1.0))

        # shell volumes enter the rate evaluation divided by the
        # tables' flux scale: the division happens on the HOST in f64
        # (raw kpc-scale shell volumes ~1e66 cm^3 overflow f32 on the
        # TPU backend; the scaled tables make the product physical)
        fscale = float(getattr(bands, "flux_scale", 1.0) or 1.0)
        ctx = OneDContext(
            tables=tables,
            cooling=cooling,
            dr=grid.dr,
            vol=jnp.asarray(np.asarray(grid.vol, dtype=np.float64)
                            / fscale, dtype=dtype),
            flux_scale=fscale,
            clumping=problem.clumping,
            isothermal=problem.isothermal,
            gamma_uvb=problem.gamma_uvb,
            epsilon=problem.epsilon,
            cosmo_cool_factor=cosmo_cool_factor,
            has_bb=sed.bb is not None,
            has_pl=sed.pl is not None,
            has_qso=sed.qso is not None,
        )
        state = State1D(
            ndens=jnp.asarray(ndens, dtype=dtype),
            temper=jnp.asarray(temper, dtype=dtype),
            xh=jnp.asarray(xh, dtype=dtype),
            xhe=jnp.asarray(xhe, dtype=dtype),
        )
        run = cls(problem=problem, grid=grid, sed=sed_norm, ctx=ctx,
                  state=state, clock=clock)
        run._step_fn = make_evolve1d(ctx)
        return run

    def step(self, dt: float):
        """One timestep (C2Ray.F90 1D:131-169).

        Cosmological rescaling for test 4 (redshift_evol + cosmo_evol at
        mid-step, C2Ray.F90 1D:158-161) is applied to the density/grid.
        """
        if self.clock is not None:
            self.clock, zfactor, _ = self.clock.redshift_evol(
                self.time + 0.5 * dt)
            zf3 = zfactor**3
            self.state = self.state._replace(ndens=self.state.ndens / zf3)
            g = self.grid
            self.grid = RadialGrid(r_in=g.r_in * zfactor,
                                   r_out=g.r_out * zfactor, mesh=g.mesh)
            # dr/vol changed: rebuild the context-bound step function
            ctx = OneDContext(**{**self.ctx.__dict__,
                                 "dr": self.grid.dr,
                                 "vol": jnp.asarray(
                                     np.asarray(self.grid.vol,
                                                dtype=np.float64)
                                     / self.ctx.flux_scale,
                                     dtype=self.state.ndens.dtype)})
            self.ctx = ctx
            self._step_fn = make_evolve1d(ctx)

        self.state, nits = self._step_fn(self.state, dt)
        self.time += dt
        return nits

    def run(self, end_time: float, num_steps: int):
        """Equal-step loop (time.F90:35-125)."""
        dt = end_time / num_steps
        for _ in range(num_steps):
            self.step(dt)
        return self.state
