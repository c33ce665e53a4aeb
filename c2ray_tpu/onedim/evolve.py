"""1D radial sweep: the TPU-native `evolve1D`.

Re-implementation of ``code/files_for_1D/evolve_new.F90``: a single
outward sweep over radius with strict i-1 -> i causality.  The sweep is
a `lax.scan` over radius whose carry is the outgoing column-density
triplet; the per-cell fixed-point iteration (photo rates -> two doric
passes averaged -> thermal, until converged, evolve_new.F90:239-394) is
a masked `lax.while_loop`.

Reference deviations (documented, both are reference bugs):
- evolve_new.F90:267-268 divides the He rates by ion%he_av(nx) with a
  stale loop index (out-of-bounds read); we use he_av(0)/he_av(1) as the
  3D code does (evolve_point.F90:268-270).
- evolve_new.F90:307 uses ion%he_av(1) where the first doric pass used
  ion%he(1); we use the current fractions in both passes like the 3D
  do_chemistry (evolve_point.F90:556-569).
"""

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import constants as const
from ..chemistry import (IonFractions, IonState, coldens, doric,
                         electrondens, prepare_doric_factors)
from ..cooling import CoolingTables
from ..radiation.photo import photoion_rates
from ..radiation.quadrature import QuadTables, photoion_rates_quad
from ..radiation.tables import RadiationTables
from ..rates import rate_coefficients
from ..thermal import thermal

# evolve_new.F90:156
MAX_COLDENSH_1D = 2.0e26
# c2ray_parameters.f90:36,44
MIN_FRACTIONAL_CHANGE = 1.0e-2
MIN_FRACTION_OF_ATOMS = 1.0e-8
MAX_CELL_ITER = 4000


class State1D(NamedTuple):
    """Grid state for the 1D problem (material module arrays)."""

    ndens: jnp.ndarray   # (mesh,)
    temper: jnp.ndarray  # (mesh,)
    xh: jnp.ndarray      # (mesh, 2)
    xhe: jnp.ndarray     # (mesh, 3)


@dataclass(frozen=True)
class OneDContext:
    """Static configuration + device tables for the 1D solver."""

    tables: object  # RadiationTables or QuadTables
    cooling: Optional[CoolingTables]
    dr: float
    vol: jnp.ndarray                # (mesh,) shell volumes
    clumping: float = 1.0
    isothermal: bool = True
    gamma_uvb: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    epsilon: float = 1.0e-20
    cosmo_cool_factor: float = 0.0
    boundary_tauHI: float = 0.0
    boundary_tauHeI: float = 0.0
    boundary_tauHeII: float = 0.0
    has_bb: bool = True
    has_pl: bool = False
    has_qso: bool = False
    max_cell_iter: int = MAX_CELL_ITER
    # the radiation tables' flux scale: `vol` is stored DIVIDED by it
    # (f32 range guard -- raw shell volumes ~1e66 cm^3 overflow f32 on
    # TPU; the scaled tables x scaled volumes cancel exactly)
    flux_scale: float = 1.0


def _cell_photorates(ctx: OneDContext, cd_in, cc_cell, vol_ph, i_state):
    """photoion_rates for one cell given incoming columns and cell columns."""
    one = jnp.ones(())
    fn = (photoion_rates_quad if isinstance(ctx.tables, QuadTables)
          else photoion_rates)
    return fn(
        ctx.tables,
        cd_in[0], cd_in[0] + cc_cell[0],
        cd_in[1], cd_in[1] + cc_cell[1],
        cd_in[2], cd_in[2] + cc_cell[2],
        vol_ph, i_state,
        nflux_bb=one if ctx.has_bb else None,
        nflux_pl=one if ctx.has_pl else None,
        nflux_qso=one if ctx.has_qso else None,
        do_heating=not ctx.isothermal,
    )


def _cell_columns(ctx, ions: IonFractions, ndens_p):
    """Column densities of one cell per species (evolve_new.F90:253-255)."""
    return (coldens(ctx.dr, ions.h0, ndens_p, 1.0 - const.abu_he),
            coldens(ctx.dr, ions.he0, ndens_p, const.abu_he),
            coldens(ctx.dr, ions.he1, ndens_p, const.abu_he))


def _solve_cell(ctx: OneDContext, dt, cd_in, ndens_p, vol_ph, temper0, ion0):
    """Fixed-point iteration for one cell (evolve_new.F90:237-394)."""
    guvb = ctx.gamma_uvb

    def cond(carry):
        ion, temper1, avg_temper, nit, done = carry
        return (~done) & (nit < ctx.max_cell_iter)

    def body(carry):
        ion, temper1, avg_temper, nit, _ = carry
        prev_avg = ion.avg
        temper2 = temper1

        # ------- photo block (evolve_new.F90:252-274)
        cc_av = _cell_columns(ctx, ion.avg, ndens_p)
        phi = _cell_photorates(ctx, cd_in, cc_av, vol_ph, ion.avg.h1)
        photo_HI = phi.photo_cell_HI / (ion.avg.h0 * ndens_p
                                        * (1.0 - const.abu_he)) + guvb[0]
        photo_HeI = phi.photo_cell_HeI / (ion.avg.he0 * ndens_p
                                          * const.abu_he) + guvb[1]
        photo_HeII = phi.photo_cell_HeII / (ion.avg.he1 * ndens_p
                                            * const.abu_he) + guvb[2]

        de = electrondens(ndens_p, ion.avg)
        rates = rate_coefficients(avg_temper)

        # ------- doric pass 1 (factors from current fractions)
        cc_cur = _cell_columns(ctx, ion.cur, ndens_p)
        fac = prepare_doric_factors(*cc_cur)
        ion1 = doric(dt, de, ion, photo_HI, photo_HeI, photo_HeII, fac,
                     rates, ctx.clumping, ctx.epsilon)
        de = electrondens(ndens_p, ion1.avg)

        # ------- doric pass 2, then average (evolve_new.F90:303-333)
        cc_cur2 = _cell_columns(ctx, ion1.cur, ndens_p)
        fac2 = prepare_doric_factors(*cc_cur2)
        ion2 = doric(dt, de, ion1, photo_HI, photo_HeI, photo_HeII, fac2,
                     rates, ctx.clumping, ctx.epsilon)

        half = lambda a, b: 0.5 * (a + b)
        cur = IonFractions(
            h0=half(ion2.cur.h0, ion1.cur.h0),
            h1=half(ion2.cur.h1, ion1.cur.h1),
            he0=half(ion2.cur.he0, ion1.cur.he0),
            he1=half(ion2.cur.he1, ion1.cur.he1),
            he2=half(ion2.cur.he2, ion1.cur.he2),
        )
        # the reference averages h_av(0), he_av(0), he_av(1) only
        # (evolve_new.F90:330-332); h_av(1)/he_av(2) keep pass-2 values
        avg = IonFractions(
            h0=half(ion2.avg.h0, ion1.avg.h0),
            h1=ion2.avg.h1,
            he0=half(ion2.avg.he0, ion1.avg.he0),
            he1=half(ion2.avg.he1, ion1.avg.he1),
            he2=ion2.avg.he2,
        )
        ion_new = IonState(cur=cur, avg=avg, old=ion.old)
        de = electrondens(ndens_p, avg)

        # ------- thermal (evolve_new.F90:336-347)
        temper1_new = temper0
        avg_temper_new = avg_temper
        if not ctx.isothermal:
            tr = thermal(dt, temper0, de, ndens_p, ion_new, phi.heat,
                         ctx.cooling, ctx.cosmo_cool_factor)
            temper1_new = tr.end_temper
            avg_temper_new = tr.avg_temper

        # ------- convergence (evolve_new.F90:349-370)
        def conv(new, old):
            return (jnp.abs(new - old) / new < MIN_FRACTIONAL_CHANGE) | (
                new < MIN_FRACTION_OF_ATOMS)

        done = (conv(avg.h0, prev_avg.h0)
                & conv(avg.he0, prev_avg.he0)
                & conv(avg.he1, prev_avg.he1)
                & conv(avg.he2, prev_avg.he2)
                & (jnp.abs(temper1_new - temper2) / temper1_new
                   < MIN_FRACTIONAL_CHANGE))
        return (ion_new, temper1_new, avg_temper_new, nit + 1, done)

    init = (ion0, temper0, temper0, jnp.int32(0), jnp.asarray(False))
    ion, temper1, avg_temper, nit, _ = jax.lax.while_loop(cond, body, init)
    return ion, temper1, nit


def make_evolve1d(ctx: OneDContext):
    """Build a jitted evolve1D(state, dt) -> (state, diagnostics)."""

    bnd = (ctx.boundary_tauHI / const.sigma_HI_at_ion_freq,
           ctx.boundary_tauHeI / const.sigma_HeI_at_ion_freq,
           ctx.boundary_tauHeII / const.sigma_HeII_at_ion_freq)

    @jax.jit
    def evolve1d_fn(state: State1D, dt):
        dtype = state.ndens.dtype

        def cell(carry, inp):
            cd_in = carry
            ndens_p, vol_ph, temper0, xh, xhe = inp
            f0 = IonFractions(h0=xh[0], h1=xh[1], he0=xhe[0], he1=xhe[1],
                              he2=xhe[2])
            ion0 = IonState(cur=f0, avg=f0, old=f0)

            shielded = cd_in[0] > MAX_COLDENSH_1D
            ion, temper1, nit = _solve_cell(ctx, dt, cd_in, ndens_p, vol_ph,
                                            temper0, ion0)
            # fully shielded cells are left untouched (evolve_new.F90:395-404)
            pick = lambda a, b: jnp.where(shielded, a, b)
            final = IonFractions(*(pick(a, b) for a, b in zip(f0, ion.cur)))
            final_avg = IonFractions(*(pick(a, b)
                                       for a, b in zip(f0, ion.avg)))
            temper1 = pick(temper0, temper1)

            # outgoing columns add the time-averaged cell column
            # (evolve_new.F90:417-424)
            cc = _cell_columns(ctx, final_avg, ndens_p)
            cd_out = (cd_in[0] + cc[0], cd_in[1] + cc[1], cd_in[2] + cc[2])

            out = (jnp.stack([final.h0, final.h1]),
                   jnp.stack([final.he0, final.he1, final.he2]),
                   temper1, nit)
            return cd_out, out

        cd0 = tuple(jnp.asarray(b, dtype=dtype) for b in bnd)
        inputs = (state.ndens, ctx.vol, state.temper, state.xh, state.xhe)
        _, (xh_new, xhe_new, temper_new, nits) = jax.lax.scan(
            cell, cd0, inputs)
        new_state = State1D(ndens=state.ndens, temper=temper_new,
                            xh=xh_new, xhe=xhe_new)
        return new_state, nits

    return evolve1d_fn


def evolve1d(ctx: OneDContext, state: State1D, dt):
    """Convenience non-cached entry point."""
    return make_evolve1d(ctx)(state, dt)
