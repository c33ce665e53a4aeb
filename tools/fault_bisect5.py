"""Stage-5 bisect: the chemistry-side gather fault is fixed (stage 4),
but the full heating bench config still faults -- isolate the bench
iteration's two halves at the bench's own shapes (128^3, 8 sources,
non-isothermal quadrature tables with 113 heat bins):

  sweeponly -- heating sweep alone (sweep_pyramid_source_batch)
  chemonly  -- global_chemistry_pass alone on synthetic rates
  full      -- the real evolve3d iteration (sweep + chemistry)
  isosweep  -- isothermal sweep (control; this ran at 68.7M in r1)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.cooling import setup_cooling_tables
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.state import begin_timestep, initial_grid_state
from c2ray_tpu.sweep import SweepConfig, build_shell_table
from c2ray_tpu.sweep.evolve3d import Evolve3DConfig, make_evolve3d_iteration
from c2ray_tpu.sweep.global_pass import (ChemistryConfig,
                                         global_chemistry_pass)
from c2ray_tpu.sweep.pyramid_sweep import sweep_pyramid_source_batch
from c2ray_tpu.sweep.source_sweep import RateGrids, SourceFields

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "sweeponly"
MESH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N_SRC = 8


def run():
    dtype = jnp.float32
    isothermal = VARIANT == "isosweep"
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
        isothermal=isothermal, dtype=dtype, n_nodes="auto")
    dr = 50.0 * const.kpc / MESH
    sweep_cfg = SweepConfig(tables=tables, mesh=MESH, dr=dr,
                            isothermal=isothermal,
                            flux_scale=bands.flux_scale)
    cooling = None if isothermal else setup_cooling_tables(dtype=dtype)
    chem_cfg = ChemistryConfig(cooling=cooling, isothermal=isothermal,
                               isothermal_temperature=1.0e4)
    rng = np.random.RandomState(7)
    srcpos = jnp.asarray(rng.randint(0, MESH, size=(N_SRC, 3)),
                         dtype=jnp.int32)
    nflux = jnp.asarray(
        np.concatenate([rng.uniform(0.5, 2.0, (N_SRC, 1)),
                        np.zeros((N_SRC, 2))], axis=1), dtype=dtype)
    state = begin_timestep(initial_grid_state(
        np.full((MESH,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4,
        dtype=dtype))
    dt = jnp.asarray(1.0e14, dtype=dtype)
    n = MESH ** 3

    if VARIANT in ("sweeponly", "isosweep"):
        fields = SourceFields(ndens=state.ndens, h_av0=state.h_av0,
                              h_av1=state.h_av1, he_av0=state.he_av0,
                              he_av1=state.he_av1)

        @jax.jit
        def f(fields, srcpos, nflux):
            return sweep_pyramid_source_batch(sweep_cfg, fields, srcpos,
                                              nflux)

        t0 = time.time()
        rates = f(fields, srcpos, nflux)
        jax.block_until_ready(rates.phih)
        print(f"{VARIANT} mesh={MESH} OK compile+run "
              f"{time.time()-t0:.1f}s")
        t0 = time.time()
        rates = f(fields, srcpos, nflux)
        jax.block_until_ready(rates.phih)
        el = time.time() - t0
        print(f"{VARIANT} steady {el:.2f}s "
              f"{n*N_SRC/el:.3e} cell-src/s")
    elif VARIANT.startswith("chemonly"):
        if VARIANT == "chemonly8":
            # cap thermal's sub-cycle at 8 steps inside the real pass
            from c2ray_tpu.sweep import global_pass as gp
            from c2ray_tpu.thermal import thermal as _th
            gp.thermal = lambda *a, **k: _th(*a, max_substeps=8, **k)
        rates = RateGrids(
            phih=jnp.asarray(10 ** rng.uniform(-14, -9, n), dtype),
            phihe0=jnp.asarray(10 ** rng.uniform(-15, -10, n), dtype),
            phihe1=jnp.asarray(10 ** rng.uniform(-16, -11, n), dtype),
            phiheat=jnp.asarray(10 ** rng.uniform(-35, -25, n), dtype),
            photon_loss=jnp.zeros((), dtype),
            lls_loss=jnp.zeros((), dtype))

        @jax.jit
        def f(state, rates):
            return global_chemistry_pass(chem_cfg, state, rates, dt)

        t0 = time.time()
        st, conv = f(state, rates)
        jax.block_until_ready(st.h_av1)
        print(f"{VARIANT} mesh={MESH} OK compile+run "
              f"{time.time()-t0:.1f}s conv={int(conv)}")
        t0 = time.time()
        st, conv = f(state, rates)
        jax.block_until_ready(st.h_av1)
        print(f"{VARIANT} steady {time.time()-t0:.2f}s")
    else:
        shells = build_shell_table(MESH)
        cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem_cfg,
                             shells=shells)
        iteration = make_evolve3d_iteration(cfg)
        t0 = time.time()
        out = iteration(state, srcpos, nflux, dt)
        jax.block_until_ready(out[0].h_av1)
        print(f"{VARIANT} mesh={MESH} OK compile+run "
              f"{time.time()-t0:.1f}s")
        t0 = time.time()
        out = iteration(out[0], srcpos, nflux, dt)
        jax.block_until_ready(out[0].h_av1)
        el = time.time() - t0
        print(f"{VARIANT} steady {el:.2f}s "
              f"{n*N_SRC/el:.3e} cell-src/s")


if __name__ == "__main__":
    run()
