"""Thermal evolution of cells: sub-cycled internal-energy integration.

Vectorised re-implementation of ``code/thermal.f90:22-174`` plus the
temperature/pressure helpers of ``code/tped.f90:41-70``.

The reference integrates each cell's internal energy with an adaptive
explicit sub-cycle (dt_thermal = relative_denergy * u / |rate|, up to
10000 sub-steps).  Here all cells advance in one `lax.while_loop` in
lockstep with per-cell masking: each cell takes its own adaptive step
until its own cumulative time reaches dt, and the loop ends when every
cell (or the iteration cap) is done.  This keeps the data-dependent trip
count out of the XLA graph shape while preserving the reference's
per-cell step sequence exactly.

The sub-cycle is exposed as an explicit {init, substeps, finalize}
carry API so the host-driven chemistry loop (sweep/global_pass.py) can
cap the lockstep at a few sub-steps, compact the unfinished minority
(the I-front cells, whose ~100+ adaptive steps otherwise set the
lockstep trip count for the whole grid) and CONTINUE their exact
per-cell step sequence on a small gathered bucket: a cell's value
sequence depends only on its own steps, so the split is bit-identical
to the monolithic loop.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as const
from .chemistry import IonState, electrondens
from .cooling import CoolingTables, coolin

# c2ray_parameters.f90:87-89
MINITEMP = 1.0
RELATIVE_DENERGY = 0.1
MAX_SUBSTEPS = 10000


def temper2pressr(temper, ndens, eldens):
    """tped.f90:41-53"""
    return (ndens + eldens) * const.k_B * temper


def pressr2temper(pressr, ndens, eldens):
    """tped.f90:58-70"""
    return pressr / (const.k_B * (ndens + eldens))


class ThermalResult(NamedTuple):
    end_temper: jnp.ndarray
    avg_temper: jnp.ndarray
    n_substeps: jnp.ndarray


class ThermalCtx(NamedTuple):
    """Per-cell constants of the thermal sub-cycle (thermal.f90:62-79):
    everything the loop body and the finalize step read besides the
    evolving carry.  A flat pytree of same-shape arrays so the host
    loop can gather/scatter it for the compacted continuation."""
    heating: jnp.ndarray
    ndens_atom: jnp.ndarray
    ndens_electron: jnp.ndarray   # coolin's ne (start-of-step state)
    ne_av: jnp.ndarray            # T<->p conversions inside the loop
    ne_end: jnp.ndarray           # end-of-step conversion (finalize)
    cosmo_cool_rate: jnp.ndarray  # factor * u0 (thermal.f90:74-79)
    T0: jnp.ndarray               # entry temperature
    xh0: jnp.ndarray              # ion.avg fractions for coolin
    xh1: jnp.ndarray
    xhe0: jnp.ndarray
    xhe1: jnp.ndarray
    xhe2: jnp.ndarray


class ThermalCarry(NamedTuple):
    """Evolving per-cell state of the sub-cycle."""
    u: jnp.ndarray
    T: jnp.ndarray
    avg_sum: jnp.ndarray
    cum: jnp.ndarray
    active: jnp.ndarray


def thermal_init(dt, end_temper, ndens_electron, ndens_atom,
                 ion: IonState, heating, cosmo_cool_factor
                 ) -> (ThermalCtx, ThermalCarry):
    """Set up the sub-cycle (thermal.f90:62-83)."""
    T0 = jnp.asarray(end_temper)
    shape = T0.shape
    dtype = T0.dtype
    bc = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype=dtype), shape)
    heating = bc(heating)
    ndens_atom = bc(ndens_atom)
    ndens_electron = bc(ndens_electron)

    # electron densities used inside the loop are held at the start-of-step
    # ionic state (thermal.f90:68-69, 131-132)
    ne_old = electrondens(ndens_atom, ion.old)
    ne_av = electrondens(ndens_atom, ion.avg)
    ne_end = electrondens(ndens_atom, ion.cur)

    u0 = temper2pressr(T0, ndens_atom, ne_old) / const.gamma1
    # fixed during the sub-cycle, from the initial energy (thermal.f90:74-79)
    cosmo_cool_rate = bc(cosmo_cool_factor) * u0

    active0 = T0 > MINITEMP  # thermal.f90:83
    zero = jnp.zeros_like(T0)
    ctx = ThermalCtx(heating=heating, ndens_atom=ndens_atom,
                     ndens_electron=ndens_electron, ne_av=ne_av,
                     ne_end=ne_end, cosmo_cool_rate=cosmo_cool_rate,
                     T0=T0, xh0=bc(ion.avg.h0), xh1=bc(ion.avg.h1),
                     xhe0=bc(ion.avg.he0), xhe1=bc(ion.avg.he1),
                     xhe2=bc(ion.avg.he2))
    carry = ThermalCarry(u=u0, T=T0, avg_sum=zero, cum=zero,
                         active=active0)
    return ctx, carry


def thermal_substeps(cooling_tables: CoolingTables, dt,
                     ctx: ThermalCtx, carry: ThermalCarry,
                     nit0=0, max_substeps: int = MAX_SUBSTEPS):
    """Run the masked lockstep sub-cycle (thermal.f90:110-155) from
    lockstep index `nit0` until every cell is done or the GLOBAL index
    reaches `max_substeps`.  Returns (carry, nit).  Calling this twice
    -- first capped, then continued on the unfinished subset -- yields
    bit-identical per-cell sequences to one uncapped call."""
    dt = jnp.asarray(dt, dtype=ctx.T0.dtype)

    def cond(state):
        carry, nit = state
        return jnp.any(carry.active) & (nit < max_substeps)

    def body(state):
        carry, nit = state
        u, T, avg_sum, cum, active = carry

        cooling = coolin(cooling_tables, ctx.ndens_atom,
                         ctx.ndens_electron, ctx.xh0, ctx.xh1,
                         ctx.xhe0, ctx.xhe1, ctx.xhe2, T
                         ) + ctx.cosmo_cool_rate
        thermal_rate = jnp.maximum(1e-50,
                                   jnp.abs(cooling - ctx.heating))
        dt_thermal = RELATIVE_DENERGY * u / thermal_rate
        dt_ode = jnp.minimum(dt_thermal, dt - cum)

        u_new = u + dt_ode * (ctx.heating - cooling)
        avg_new = avg_sum + 0.5 * T * dt_ode
        T_new = pressr2temper(u_new * const.gamma1, ctx.ndens_atom,
                              ctx.ne_av)
        avg_new = avg_new + 0.5 * T_new * dt_ode

        # floor at minitemp (thermal.f90:140-146).  The reference resets
        # internal_energy to the *pressure* at minitemp there (missing the
        # 1/gamma1); we use the consistent u = p/gamma1.
        too_cold = T_new < MINITEMP
        u_floor = temper2pressr(jnp.asarray(MINITEMP, T.dtype),
                                ctx.ndens_atom, ctx.ne_av) / const.gamma1
        u_new = jnp.where(too_cold, u_floor, u_new)
        T_new = jnp.where(too_cold, MINITEMP, T_new)

        cum_new = cum + dt_ode
        done = (cum_new >= dt) | (jnp.abs(cum_new - dt) < 1e-6 * dt)

        # only active cells advance
        u = jnp.where(active, u_new, u)
        T = jnp.where(active, T_new, T)
        avg_sum = jnp.where(active, avg_new, avg_sum)
        cum = jnp.where(active, cum_new, cum)
        active = active & ~done
        return (ThermalCarry(u, T, avg_sum, cum, active), nit + 1)

    carry, nit = jax.lax.while_loop(
        cond, body, (carry, jnp.asarray(nit0, jnp.int32)))
    return carry, nit


def thermal_finalize(ctx: ThermalCtx, carry: ThermalCarry, dt
                     ) -> (jnp.ndarray, jnp.ndarray):
    """(end_temper, avg_temper) from a finished carry
    (thermal.f90:160-171)."""
    dt = jnp.asarray(dt, dtype=ctx.T0.dtype)
    avg_temper = jnp.where(dt > 0.0, carry.avg_sum / dt, ctx.T0)
    end_T = pressr2temper(carry.u * const.gamma1, ctx.ndens_atom,
                          ctx.ne_end)
    # cells that never entered the loop keep their temperature and report
    # avg = initial (thermal.f90:83,160-171)
    active0 = ctx.T0 > MINITEMP
    end_T = jnp.where(active0, end_T, ctx.T0)
    avg_temper = jnp.where(active0, avg_temper, ctx.T0)
    return end_T, avg_temper


def thermal(
    dt,
    end_temper,
    ndens_electron,
    ndens_atom,
    ion: IonState,
    heating,
    cooling_tables: CoolingTables,
    cosmo_cool_factor=0.0,
    max_substeps: int = MAX_SUBSTEPS,
) -> ThermalResult:
    """Sub-cycled thermal update (thermal.f90:22-174), vectorised.

    ``heating`` is the photo-heating rate [erg cm^-3 s^-1] (phi%heat).
    ``cosmo_cool_factor`` is 2 (dz/dt)/(1+z): the adiabatic cosmological
    cooling rate is factor * u evaluated on the initial internal energy
    (thermal.f90:74-79, cosmology.f90:207-234).
    All arguments broadcast over the cell batch shape.
    """
    ctx, carry = thermal_init(dt, end_temper, ndens_electron,
                              ndens_atom, ion, heating,
                              cosmo_cool_factor)
    carry, nit = thermal_substeps(cooling_tables, dt, ctx, carry,
                                  0, max_substeps)
    end_T, avg_temper = thermal_finalize(ctx, carry, dt)
    return ThermalResult(end_temper=end_T, avg_temper=avg_temper,
                         n_substeps=nit)
