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
    T0 = jnp.asarray(end_temper)
    shape = T0.shape
    dtype = T0.dtype
    bc = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype=dtype), shape)
    heating = bc(heating)
    ndens_atom = bc(ndens_atom)
    ndens_electron = bc(ndens_electron)
    dt = jnp.asarray(dt, dtype=dtype)

    # electron densities used inside the loop are held at the start-of-step
    # ionic state (thermal.f90:68-69, 131-132)
    ne_old = electrondens(ndens_atom, ion.old)
    ne_av = electrondens(ndens_atom, ion.avg)
    ne_end = electrondens(ndens_atom, ion.cur)

    u0 = temper2pressr(T0, ndens_atom, ne_old) / const.gamma1
    # fixed during the sub-cycle, from the initial energy (thermal.f90:74-79)
    cosmo_cool_rate = bc(cosmo_cool_factor) * u0

    active0 = T0 > MINITEMP  # thermal.f90:83

    def cond(carry):
        u, T, avg_sum, cum, nit, active = carry
        return jnp.any(active) & (nit < max_substeps)

    def body(carry):
        u, T, avg_sum, cum, nit, active = carry

        cooling = coolin(cooling_tables, ndens_atom, ndens_electron,
                         ion.avg.h0, ion.avg.h1, ion.avg.he0, ion.avg.he1,
                         ion.avg.he2, T) + cosmo_cool_rate
        thermal_rate = jnp.maximum(1e-50, jnp.abs(cooling - heating))
        dt_thermal = RELATIVE_DENERGY * u / thermal_rate
        dt_ode = jnp.minimum(dt_thermal, dt - cum)

        u_new = u + dt_ode * (heating - cooling)
        avg_new = avg_sum + 0.5 * T * dt_ode
        T_new = pressr2temper(u_new * const.gamma1, ndens_atom, ne_av)
        avg_new = avg_new + 0.5 * T_new * dt_ode

        # floor at minitemp (thermal.f90:140-146).  The reference resets
        # internal_energy to the *pressure* at minitemp there (missing the
        # 1/gamma1); we use the consistent u = p/gamma1.
        too_cold = T_new < MINITEMP
        u_floor = temper2pressr(jnp.asarray(MINITEMP, dtype), ndens_atom,
                                ne_av) / const.gamma1
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
        return (u, T, avg_sum, cum, nit + 1, active)

    zero = jnp.zeros_like(T0)
    u, T, avg_sum, cum, nit, _ = jax.lax.while_loop(
        cond, body, (u0, T0, zero, zero, jnp.int32(0), active0))

    avg_temper = jnp.where(dt > 0.0, avg_sum / dt, T0)
    end_T = pressr2temper(u * const.gamma1, ndens_atom, ne_end)

    # cells that never entered the loop keep their temperature and report
    # avg = initial (thermal.f90:83,160-171)
    end_T = jnp.where(active0, end_T, T0)
    avg_temper = jnp.where(active0, avg_temper, T0)
    return ThermalResult(end_temper=end_T, avg_temper=avg_temper,
                         n_substeps=nit)
