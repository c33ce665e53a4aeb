"""Stage-6: shippable workarounds for the nested-while fault in the
real global_chemistry_pass (stage 5: cap-8 unrolled passes, cap-10000
nested faults).

  chunk8  -- thermal's while body executes 8 individually-masked
             sub-steps per iteration (identical per-cell step sequence,
             cap 10000 total) -- fewer, fatter while iterations
  dbuf    -- unmodified pass, XLA while-loop double-buffering disabled
  hostloop -- outer chemistry loop at host level; the jitted body has
             only the thermal while_loop inside (proven clean shape)
"""

import os
import sys

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "chunk8"
MESH = int(sys.argv[2]) if len(sys.argv) > 2 else 64

if VARIANT == "dbuf":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_tpu_enable_while_loop_double_buffering=false")

sys.path.insert(0, ".")

import time

import jax
import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.chemistry import electrondens
from c2ray_tpu.cooling import coolin, setup_cooling_tables
from c2ray_tpu.state import begin_timestep, initial_grid_state
from c2ray_tpu.sweep.global_pass import (ChemistryConfig,
                                         global_chemistry_pass)
from c2ray_tpu.sweep.source_sweep import RateGrids
from c2ray_tpu.thermal import (MINITEMP, RELATIVE_DENERGY, ThermalResult,
                               pressr2temper, temper2pressr)
from c2ray_tpu import thermal as thermal_mod


def chunk_thermal(dt, end_temper, ndens_electron, ndens_atom, ion,
                  heating, cooling_tables, cosmo_cool_factor=0.0,
                  max_substeps=10000, chunk=8):
    """thermal() with `chunk` individually-masked sub-steps unrolled
    per while iteration; per-cell step sequence identical."""
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

    def substep(u, T, avg_sum, cum, active):
        cooling = coolin(cooling_tables, ndens_atom, ndens_electron,
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
        return u, T, avg_sum, cum, active

    n_blocks = -(-max_substeps // chunk)

    def cond(c):
        u, T, a, cum, nit, act = c
        return jnp.any(act) & (nit < n_blocks)

    def body(c):
        u, T, a, cum, nit, act = c
        for _ in range(chunk):
            u, T, a, cum, act = substep(u, T, a, cum, act)
        return (u, T, a, cum, nit + 1, act)

    zero = jnp.zeros_like(T0)
    u, T, avg_sum, cum, nit, _ = jax.lax.while_loop(
        cond, body, (u0, T0, zero, zero, jnp.int32(0), active0))
    avg_temper = jnp.where(dt > 0.0, avg_sum / dt, T0)
    end_T = pressr2temper(u * const.gamma1, ndens_atom, ne_end)
    end_T = jnp.where(active0, end_T, T0)
    avg_temper = jnp.where(active0, avg_temper, T0)
    return ThermalResult(end_temper=end_T, avg_temper=avg_temper,
                         n_substeps=nit * chunk)


def run():
    dtype = jnp.float32
    n = MESH ** 3
    cooling = setup_cooling_tables(dtype=dtype)
    chem_cfg = ChemistryConfig(cooling=cooling, isothermal=False,
                               isothermal_temperature=1.0e4)
    rng = np.random.RandomState(7)
    state = begin_timestep(initial_grid_state(
        np.full((MESH,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4,
        dtype=dtype))
    dt = jnp.asarray(1.0e14, dtype)
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-14, -9, n), dtype),
        phihe0=jnp.asarray(10 ** rng.uniform(-15, -10, n), dtype),
        phihe1=jnp.asarray(10 ** rng.uniform(-16, -11, n), dtype),
        phiheat=jnp.asarray(10 ** rng.uniform(-35, -25, n), dtype),
        photon_loss=jnp.zeros((), dtype),
        lls_loss=jnp.zeros((), dtype))

    if VARIANT == "chunk8":
        from c2ray_tpu.sweep import global_pass as gp
        gp.thermal = chunk_thermal

    @jax.jit
    def f(state, rates):
        return global_chemistry_pass(chem_cfg, state, rates, dt)

    t0 = time.time()
    st, conv = f(state, rates)
    jax.block_until_ready(st.h_av1)
    print(f"{VARIANT} mesh={MESH} OK compile+run {time.time()-t0:.1f}s "
          f"conv={int(conv)}")
    t0 = time.time()
    st, conv = f(state, rates)
    jax.block_until_ready(st.h_av1)
    print(f"{VARIANT} steady {time.time()-t0:.2f}s")




def run_hostloop():
    """Outer chemistry loop at host level: jit body = {doric x2 +
    thermal(while)} -- no enclosing while_loop around doric."""
    from c2ray_tpu.sweep.global_pass import (MAX_CHEM_ITER,
                                             _chemistry_setup,
                                             _chemistry_iteration)
    # fall back to an inline replica if the refactor isn't in yet
    raise SystemExit("refactor not present")


def run_hostloop_inline():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from c2ray_tpu.chemistry import (IonFractions, IonState, coldens,
                                     doric, prepare_doric_factors)
    from c2ray_tpu.rates import rate_coefficients
    from c2ray_tpu.sweep.global_pass import (MAX_CHEM_ITER,
                                             MIN_FRACTION_OF_ATOMS,
                                             MIN_FRACTIONAL_CHANGE)
    from c2ray_tpu.thermal import thermal

    dtype = jnp.float32
    n = MESH ** 3
    cooling = setup_cooling_tables(dtype=dtype)
    rng = np.random.RandomState(7)
    state = begin_timestep(initial_grid_state(
        np.full((MESH,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4,
        dtype=dtype))
    dt = jnp.asarray(1.0e14, dtype)
    phi_HI = jnp.asarray(10 ** rng.uniform(-14, -9, n), dtype)
    phi_HeI = phi_HI * 0.1
    phi_HeII = phi_HI * 0.01
    phi_heat = jnp.asarray(10 ** rng.uniform(-35, -25, n), dtype)
    ndens = state.ndens
    clumping = state.clumping
    eps = 1e-20

    def factors_from(ions):
        cch = coldens(1.0, ions.h0, ndens, 1.0 - const.abu_he)
        cche0 = coldens(1.0, ions.he0, ndens, const.abu_he)
        cche1 = coldens(1.0, ions.he1, ndens, const.abu_he)
        return prepare_doric_factors(cch, cche0, cche1)

    @jax.jit
    def body(ion, temper1, avg_t, active):
        prev_avg = ion.avg
        temper2 = temper1
        de = electrondens(ndens, ion.avg)
        rates = rate_coefficients(avg_t)
        fac = factors_from(ion.cur)
        ion1 = doric(dt, de, ion, phi_HI, phi_HeI, phi_HeII, fac,
                     rates, clumping, eps)
        de = electrondens(ndens, ion1.avg)
        fac2 = factors_from(ion1.cur)
        ion2 = doric(dt, de, ion1, phi_HI, phi_HeI, phi_HeII, fac2,
                     rates, clumping, eps)
        half = lambda a, b: 0.5 * (a + b)
        cur = IonFractions(*(half(a, b) for a, b in
                             zip(ion2.cur, ion1.cur)))
        avg = IonFractions(
            h0=half(ion2.avg.h0, ion1.avg.h0), h1=ion2.avg.h1,
            he0=half(ion2.avg.he0, ion1.avg.he0),
            he1=half(ion2.avg.he1, ion1.avg.he1), he2=ion2.avg.he2)
        ion_new = IonState(cur=cur, avg=avg, old=ion.old)
        de = electrondens(ndens, ion_new.avg)
        tr = thermal(dt, state.t_final, de, ndens, ion_new, phi_heat,
                     cooling, 0.0)
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
        return ion_out, temper1, avg_t, active, jnp.any(active)

    ion = state.ion_state(eps)
    temper1 = state.t_final
    avg_t = state.t_av
    active = jnp.ones_like(ndens, dtype=bool)
    t0 = time.time()
    nit = 0
    while nit < MAX_CHEM_ITER:
        ion, temper1, avg_t, active, more = body(ion, temper1, avg_t,
                                                 active)
        nit += 1
        if not bool(more):
            break
    jax.block_until_ready(avg_t)
    print(f"hostloop mesh={MESH} OK compile+run {time.time()-t0:.1f}s "
          f"iters {nit}")
    t0 = time.time()
    ion2_, t1_, at_, act_, m_ = body(ion, temper1, avg_t, active)
    jax.block_until_ready(at_)
    print(f"hostloop steady-periter {time.time()-t0:.3f}s")


if __name__ == "__main__":
    if VARIANT == "hostloop":
        run_hostloop_inline()
    else:
        run()
