"""Stage-2 bisect of the TPU device fault: thermal() internals.

Stage 1 (tools/fault_bisect.py) showed the heating chemistry loop is
clean without thermal ('nothermal' passes) and faults with thermal even
at max_substeps=8 ('shortthermal'), so the fault lives in the thermal
sub-cycle or its interaction with the outer while_loop.  Variants:

  alone        -- jit(thermal) directly on 64^3 inputs, no outer loop
  nested1      -- thermal inside a trivial outer lax.while_loop(1 trip)
  nestedchem   -- outer chemistry-shaped loop, doric skipped, thermal on
  nocool       -- chemistry loop + thermal with coolin() -> constant
  nogather     -- chemistry loop + thermal with table gathers replaced
                  by a polynomial in log T
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu import thermal as thermal_mod
from c2ray_tpu.chemistry import IonFractions, IonState
from c2ray_tpu.cooling import CoolingTables, setup_cooling_tables, coolin
from c2ray_tpu.state import initial_grid_state
from c2ray_tpu.thermal import thermal

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "alone"
MESH = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def make_inputs():
    dtype = jnp.float32
    n = MESH ** 3
    rng = np.random.RandomState(7)
    ndens = jnp.full((n,), 1e-4, dtype)
    x = jnp.asarray(rng.uniform(0.0, 1.0, n), dtype)
    frac = IonFractions(h0=1.0 - x, h1=x, he0=1.0 - x, he1=x * 0.9,
                        he2=x * 0.1)
    ion = IonState(cur=frac, avg=frac, old=frac)
    heat = jnp.asarray(10 ** rng.uniform(-35, -25, n), dtype)
    T0 = jnp.full((n,), 1e4, dtype)
    de = ndens * x
    dt = jnp.asarray(1e14, dtype)
    return dtype, ndens, ion, heat, T0, de, dt


def run():
    dtype, ndens, ion, heat, T0, de, dt = make_inputs()
    cooling = setup_cooling_tables(dtype=dtype)

    if VARIANT == "nocool":
        orig = thermal_mod.coolin
        thermal_mod.coolin = (
            lambda tables, nd, ed, *a: nd * ed * 1e-24 + 0.0 * a[-1])
    elif VARIANT == "nogather":
        def poly_coolin(tables, nd, ed, xh0, xh1, xhe0, xhe1, xhe2, T):
            lt = jnp.log10(jnp.maximum(T, 10.0))
            lam = 10.0 ** (-23.0 + 0.5 * (lt - 4.0))
            return nd * ed * lam * (xh0 + xh1 + xhe0 + xhe1 + xhe2)
        thermal_mod.coolin = poly_coolin

    def f_alone(T0):
        r = thermal(dt, T0, de, ndens, ion, heat, cooling, 0.0,
                    max_substeps=8)
        return r.avg_temper

    def f_nested1(T0):
        def body(c):
            T, i = c
            r = thermal(dt, T, de, ndens, ion, heat, cooling, 0.0,
                        max_substeps=8)
            return r.avg_temper, i + 1
        T, _ = jax.lax.while_loop(lambda c: c[1] < 1, body,
                                  (T0, jnp.int32(0)))
        return T

    def f_chemshape(T0):
        # outer loop shaped like _do_chemistry_global but with doric
        # replaced by a relaxation; thermal with full coolin
        def cond(c):
            T, avt, nit, act = c
            return jnp.any(act) & (nit < 400)

        def body(c):
            T, avt, nit, act = c
            r = thermal(dt, T0, de, ndens, ion, heat, cooling, 0.0,
                        max_substeps=8)
            Tn = r.end_temper
            avn = r.avg_temper
            done = jnp.abs((Tn - T) / jnp.maximum(Tn, 1.0)) < 1e-2
            T = jnp.where(act, Tn, T)
            avt = jnp.where(act, avn, avt)
            act = act & ~done
            return (T, avt, nit + 1, act)

        act0 = jnp.ones_like(T0, dtype=bool)
        T, avt, nit, _ = jax.lax.while_loop(
            cond, body, (T0, T0, jnp.int32(0), act0))
        return avt

    fns = {"alone": f_alone, "nested1": f_nested1,
           "nestedchem": f_chemshape, "nocool": f_chemshape,
           "nogather": f_chemshape}
    f = jax.jit(fns[VARIANT])
    t0 = time.time()
    out = f(T0)
    jax.block_until_ready(out)
    print(f"{VARIANT} mesh={MESH} OK compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    out = f(T0)
    jax.block_until_ready(out)
    print(f"{VARIANT} steady {time.time()-t0:.2f}s")


if __name__ == "__main__":
    run()
