"""Bisect the TPU device fault in the heating chemistry pass.

Variants of _do_chemistry_global's while-loop body, toggled from the
command line, all at mesh 64^3 f32 (the smallest faulting size):
  full        -- the real body (expected: device fault)
  nothermal   -- heating rates traced but thermal() skipped
  fixedrates  -- thermal on, but rate_coefficients hoisted out of loop
  nodoric     -- thermal on, doric replaced with a trivial update
  shortthermal -- thermal on with max_substeps=8
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from c2ray_tpu.chemistry import (IonFractions, IonState, coldens, doric,
                                 electrondens, prepare_doric_factors)
from c2ray_tpu.cooling import setup_cooling_tables
from c2ray_tpu.rates import rate_coefficients
from c2ray_tpu.state import initial_grid_state
from c2ray_tpu.sweep.global_pass import (MAX_CHEM_ITER,
                                         MIN_FRACTION_OF_ATOMS,
                                         MIN_FRACTIONAL_CHANGE)
from c2ray_tpu.thermal import thermal
from c2ray_tpu import constants as const

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
MESH = int(sys.argv[2]) if len(sys.argv) > 2 else 64


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

    max_sub = 8 if VARIANT == "shortthermal" else 10000

    def chem(state):
        ion0 = state.ion_state(eps)
        temper0 = state.t_final
        avg_t_0 = state.t_av
        hoisted = rate_coefficients(avg_t_0)

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
            rates = (hoisted if VARIANT == "fixedrates"
                     else rate_coefficients(avg_t))
            if VARIANT == "nodoric":
                newfrac = jnp.clip(
                    ion.avg.h1 + phi_HI * dt * 1e-18, 0.0, 1.0)
                cur = IonFractions(h0=1.0 - newfrac, h1=newfrac,
                                   he0=ion.cur.he0, he1=ion.cur.he1,
                                   he2=ion.cur.he2)
                ion_new = IonState(cur=cur, avg=cur, old=ion.old)
            else:
                fac = factors_from(ion.cur)
                ion1 = doric(dt, de, ion, phi_HI, phi_HeI, phi_HeII,
                             fac, rates, clumping, eps)
                de = electrondens(ndens, ion1.avg)
                fac2 = factors_from(ion1.cur)
                ion2 = doric(dt, de, ion1, phi_HI, phi_HeI, phi_HeII,
                             fac2, rates, clumping, eps)
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

            if VARIANT == "nothermal":
                temper1_new = temper1
                avg_t_new = avg_t
            else:
                tr = thermal(dt, temper0, de, ndens, ion_new, phi_heat,
                             cooling, 0.0, max_substeps=max_sub)
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
