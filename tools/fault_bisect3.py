"""Stage-3 bisect: the fault needs BOTH doric and thermal in the same
while_loop body (stage 1: nothermal OK, nodoric OK, shortthermal /
fixedrates FAULT).  Try structural workarounds on the full body:

  fullref     -- the real body again (sanity: expect fault)
  nocool      -- full, coolin() -> closed form (no table gather)
  remat       -- full, thermal() wrapped in jax.checkpoint
  rematdoric  -- full, the two doric passes wrapped in jax.checkpoint
  scanthermal -- full, thermal's inner while_loop -> masked lax.scan
                 over a fixed 8 sub-steps (no nested while_loop)
  optbar      -- full, optimization_barrier between doric and thermal
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu import thermal as thermal_mod
from c2ray_tpu.chemistry import (IonFractions, IonState, coldens, doric,
                                 electrondens, prepare_doric_factors)
from c2ray_tpu.cooling import setup_cooling_tables
from c2ray_tpu.rates import rate_coefficients
from c2ray_tpu.state import initial_grid_state
from c2ray_tpu.sweep.global_pass import (MAX_CHEM_ITER,
                                         MIN_FRACTION_OF_ATOMS,
                                         MIN_FRACTIONAL_CHANGE)
from c2ray_tpu.thermal import (MINITEMP, RELATIVE_DENERGY, ThermalResult,
                               pressr2temper, temper2pressr, thermal)
from c2ray_tpu.cooling import coolin

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "fullref"
MESH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
import os
MAX_SUB = int(os.environ.get("BISECT_MAX_SUB", 8))


def scan_thermal(dt, end_temper, ndens_electron, ndens_atom, ion,
                 heating, tables, cosmo_cool_factor):
    """thermal() with the inner while_loop unrolled into a masked
    fixed-length lax.scan (MAX_SUB steps)."""
    T0 = jnp.asarray(end_temper)
    shape = T0.shape
    dtype = T0.dtype
    bc = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype=dtype), shape)
    heating = bc(heating)
    ndens_atom = bc(ndens_atom)
    ndens_electron = bc(ndens_electron)
    dt = jnp.asarray(dt, dtype=dtype)
    ne_old = electrondens(ndens_atom, ion.old)
    ne_av = electrondens(ndens_atom, ion.avg)
    ne_end = electrondens(ndens_atom, ion.cur)
    u0 = temper2pressr(T0, ndens_atom, ne_old) / const.gamma1
    cosmo_cool_rate = bc(cosmo_cool_factor) * u0
    active0 = T0 > MINITEMP

    def body(carry, _):
        u, T, avg_sum, cum, active = carry
        cooling = coolin(tables, ndens_atom, ndens_electron,
                         ion.avg.h0, ion.avg.h1, ion.avg.he0,
                         ion.avg.he1, ion.avg.he2, T) + cosmo_cool_rate
        rate = jnp.maximum(1e-50, jnp.abs(cooling - heating))
        dt_ode = jnp.minimum(RELATIVE_DENERGY * u / rate, dt - cum)
        u_new = u + dt_ode * (heating - cooling)
        avg_new = avg_sum + 0.5 * T * dt_ode
        T_new = pressr2temper(u_new * const.gamma1, ndens_atom, ne_av)
        avg_new = avg_new + 0.5 * T_new * dt_ode
        too_cold = T_new < MINITEMP
        u_floor = temper2pressr(jnp.asarray(MINITEMP, dtype),
                                ndens_atom, ne_av) / const.gamma1
        u_new = jnp.where(too_cold, u_floor, u_new)
        T_new = jnp.where(too_cold, MINITEMP, T_new)
        cum_new = cum + dt_ode
        done = (cum_new >= dt) | (jnp.abs(cum_new - dt) < 1e-6 * dt)
        u = jnp.where(active, u_new, u)
        T = jnp.where(active, T_new, T)
        avg_sum = jnp.where(active, avg_new, avg_sum)
        cum = jnp.where(active, cum_new, cum)
        active = active & ~done
        return (u, T, avg_sum, cum, active), None

    zero = jnp.zeros_like(T0)
    (u, T, avg_sum, cum, _), _ = jax.lax.scan(
        body, (u0, T0, zero, zero, active0), None, length=MAX_SUB)
    avg_temper = jnp.where(dt > 0.0, avg_sum / dt, T0)
    end_T = pressr2temper(u * const.gamma1, ndens_atom, ne_end)
    end_T = jnp.where(active0, end_T, T0)
    avg_temper = jnp.where(active0, avg_temper, T0)
    return ThermalResult(end_temper=end_T, avg_temper=avg_temper,
                         n_substeps=jnp.int32(MAX_SUB))


def run():
    dtype = jnp.float32
    n = MESH ** 3
    cooling = setup_cooling_tables(dtype=dtype)
    rng = np.random.RandomState(7)
    state = initial_grid_state(np.full((MESH,) * 3, 1e-4), 0., 0., 0.,
                               1e4, dtype=dtype)
    phi_HI = jnp.asarray(10 ** rng.uniform(-14, -9, n), dtype)
    phi_HeI = phi_HI * 0.1
    phi_HeII = phi_HI * 0.01
    phi_heat = jnp.asarray(10 ** rng.uniform(-35, -25, n), dtype)
    dt = jnp.asarray(1e14, dtype)
    ndens = state.ndens
    clumping = state.clumping
    eps = 1e-20

    if VARIANT == "nocool":
        thermal_mod.coolin = (
            lambda tables, nd, ed, xh0, xh1, xhe0, xhe1, xhe2, T:
            nd * ed * 1e-24 * (xh0 + xh1) + 0.0 * T)

    def thermal_call(dt_, T0, de, ion_new):
        if VARIANT == "scanthermal":
            return scan_thermal(dt_, T0, de, ndens, ion_new, phi_heat,
                                cooling, 0.0)
        fn = thermal
        if VARIANT == "remat":
            fn = jax.checkpoint(
                lambda T0_, de_, ion_: thermal(
                    dt_, T0_, de_, ndens, ion_, phi_heat, cooling, 0.0,
                    max_substeps=MAX_SUB))
            return fn(T0, de, ion_new)
        return thermal(dt_, T0, de, ndens, ion_new, phi_heat, cooling,
                       0.0, max_substeps=MAX_SUB)

    def chem(state):
        ion0 = state.ion_state(eps)
        temper0 = state.t_final
        avg_t_0 = state.t_av

        def factors_from(ions):
            cch = coldens(1.0, ions.h0, ndens, 1.0 - const.abu_he)
            cche0 = coldens(1.0, ions.he0, ndens, const.abu_he)
            cche1 = coldens(1.0, ions.he1, ndens, const.abu_he)
            return prepare_doric_factors(cch, cche0, cche1)

        def cond(c):
            ion, t1, avt, nit, act = c
            return jnp.any(act) & (nit < MAX_CHEM_ITER)

        def body(c):
            ion, temper1, avg_t, nit, active = c
            prev_avg = ion.avg
            temper2 = temper1
            de = electrondens(ndens, ion.avg)
            rates = rate_coefficients(avg_t)

            def two_doric(ion_, de_):
                fac = factors_from(ion_.cur)
                ion1 = doric(dt, de_, ion_, phi_HI, phi_HeI, phi_HeII,
                             fac, rates, clumping, eps)
                de2 = electrondens(ndens, ion1.avg)
                fac2 = factors_from(ion1.cur)
                ion2 = doric(dt, de2, ion1, phi_HI, phi_HeI, phi_HeII,
                             fac2, rates, clumping, eps)
                return ion1, ion2

            if VARIANT == "rematdoric":
                ion1, ion2 = jax.checkpoint(two_doric)(ion, de)
            else:
                ion1, ion2 = two_doric(ion, de)
            half = lambda a, b: 0.5 * (a + b)
            cur = IonFractions(*(half(a, b) for a, b in
                                 zip(ion2.cur, ion1.cur)))
            avg = IonFractions(
                h0=half(ion2.avg.h0, ion1.avg.h0), h1=ion2.avg.h1,
                he0=half(ion2.avg.he0, ion1.avg.he0),
                he1=half(ion2.avg.he1, ion1.avg.he1),
                he2=ion2.avg.he2)
            ion_new = IonState(cur=cur, avg=avg, old=ion.old)
            de = electrondens(ndens, ion_new.avg)

            if VARIANT == "optbar":
                de, ion_new = jax.lax.optimization_barrier(
                    (de, ion_new))

            tr = thermal_call(dt, temper0, de, ion_new)
            temper1_new = tr.end_temper
            avg_t_new = tr.avg_temper

            def convf(new, old):
                return (jnp.abs((new - old) / new)
                        < MIN_FRACTIONAL_CHANGE) | (
                            new < MIN_FRACTION_OF_ATOMS)

            done = (convf(ion_new.avg.h0, prev_avg.h0)
                    & convf(ion_new.avg.he0, prev_avg.he0)
                    & convf(ion_new.avg.he2, prev_avg.he2)
                    & (jnp.abs((temper1_new - temper2)
                               / jnp.maximum(temper1_new, 1.0))
                       < MIN_FRACTIONAL_CHANGE))
            keep = lambda new, old: jnp.where(active, new, old)
            ion_out = jax.tree.map(keep, ion_new, ion)
            temper1 = keep(temper1_new, temper1)
            avg_t = keep(avg_t_new, avg_t)
            active = active & ~done
            return (ion_out, temper1, avg_t, nit + 1, active)

        active0 = jnp.ones_like(ndens, dtype=bool)
        carry = (ion0, state.t_final, avg_t_0, jnp.int32(0), active0)
        ion, t1, avt, nit, _ = jax.lax.while_loop(cond, body, carry)
        return avt, nit

    f = jax.jit(chem)
    t0 = time.time()
    avt, nit = f(state)
    jax.block_until_ready(avt)
    print(f"{VARIANT} mesh={MESH} OK compile+run {time.time()-t0:.1f}s "
          f"iters {int(nit)}")
    t0 = time.time()
    avt, nit = f(state)
    jax.block_until_ready(avt)
    print(f"{VARIANT} steady {time.time()-t0:.2f}s")


if __name__ == "__main__":
    run()
