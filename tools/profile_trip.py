"""Decompose the cost of ONE full-grid heating chemistry trip on-chip.

The round-4 profile (tools/profile_heating.py) showed the heating
iteration is chemistry-bound: ~7 full-grid host-loop trips (~1.6 s)
before the compaction crossover.  This tool breaks a single full-grid
trip (the k=1 jitted body of global_pass._host_body) into its parts to
find the lever:

  - t_trip      : the whole {rates -> 2x doric -> thermal} body
  - t_doric     : the body with thermal skipped (isothermal-structure
                  timing of the same doric work)
  - t_thermal   : thermal() alone on the full grid (sub-cycled loop)
  - nsub        : lockstep sub-step count of that thermal call
  - t_coolin    : ONE coolin() evaluation on the full grid (the
                  two-hot MXU interpolation) -- per-sub-step cost
  - t_rates     : rate_coefficients(T) on the full grid

Usage: python tools/profile_trip.py [mesh] [n_src]
Prints one JSON line.  Reference cost model: evolve_point.F90:487-640,
thermal.f90:110-155.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, *args, n=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main(mesh=128, n_src=8):
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(os.path.dirname(__file__), "..",
                                        ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from c2ray_tpu import constants as const
    from c2ray_tpu.chemistry import electrondens
    from c2ray_tpu.cooling import coolin, setup_cooling_tables
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.rates import rate_coefficients
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep import SweepConfig
    from c2ray_tpu.sweep import global_pass as gp
    from c2ray_tpu.sweep.pyramid_sweep import sweep_pyramid_source_batch
    from c2ray_tpu.sweep.source_sweep import SourceFields
    from c2ray_tpu.thermal import thermal

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64

    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
        isothermal=False, dtype=dtype, n_nodes=8)
    dr = 50.0 * const.kpc / mesh
    sweep_cfg = SweepConfig(tables=tables, mesh=mesh, dr=dr,
                            isothermal=False,
                            flux_scale=bands.flux_scale)
    cooling = setup_cooling_tables(dtype=dtype)
    cfg = gp.ChemistryConfig(cooling=cooling, isothermal=False)

    rng = np.random.RandomState(7)
    srcpos = jnp.asarray(rng.randint(0, mesh, size=(n_src, 3)),
                         dtype=jnp.int32)
    nflux = jnp.asarray(
        np.concatenate([rng.uniform(0.5, 2.0, (n_src, 1)),
                        np.zeros((n_src, 2))], axis=1), dtype=dtype)
    state = begin_timestep(initial_grid_state(
        np.full((mesh,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4,
        dtype=dtype))
    dt = jnp.asarray(1.0e14, dtype=dtype)
    drj = jnp.asarray(dr, dtype=dtype)
    vos = jnp.asarray(dr ** 3 / sweep_cfg.flux_scale, dtype=dtype)

    sweep_jit = jax.jit(lambda st, sp, nf, d, v:
                        sweep_pyramid_source_batch(
                            sweep_cfg,
                            SourceFields(ndens=st.ndens, h_av0=st.h_av0,
                                         h_av1=st.h_av1,
                                         he_av0=st.he_av0,
                                         he_av1=st.he_av1),
                            sp, nf, radius=None, dr=d,
                            vol_over_scale=v))
    rates = sweep_jit(state, srcpos, nflux, drj, vos)
    jax.block_until_ready(rates.phih)

    # trip inputs exactly as _do_chemistry_global builds them
    ion0 = state.ion_state(cfg.epsilon)
    temper1_0, avg_t_0, _ = gp._chem_setup(cfg, state)
    clump = jnp.broadcast_to(state.clumping, state.ndens.shape)
    args = (state.ndens, clump, rates.phih, rates.phihe0, rates.phihe1,
            rates.phiheat, temper1_0)
    ccf = jnp.asarray(0.0, dtype=dtype)
    active0 = jnp.ones_like(state.ndens, dtype=bool)
    carry = (ion0, temper1_0, avg_t_0, active0)

    body = gp._host_body(cfg, 1)
    t_trip, (carry1, cnt) = timed(lambda: body(dt, *args, ccf, carry))
    print(f"# t_trip={t_trip*1e3:.1f} ms  active_after={int(cnt)}",
          flush=True)

    # doric-only: same body structure with thermal sliced out via an
    # isothermal config whose fixed T equals the trip's start T
    cfg_iso = gp.ChemistryConfig(cooling=None, isothermal=True)
    body_iso = gp._host_body(cfg_iso, 1)
    t_doric, _ = timed(lambda: body_iso(dt, *args, ccf, carry))
    print(f"# t_doric(2x doric, no thermal)={t_doric*1e3:.1f} ms",
          flush=True)

    # thermal alone, on the post-doric ion state of the real first trip
    ion_mid = carry1[0]
    de = electrondens(state.ndens, ion_mid.avg)

    @jax.jit
    def thermal_only(dt_, t0, de_, nd, ion, heat, ccf_):
        r = thermal(dt_, t0, de_, nd, ion, heat, cooling, ccf_)
        return r.end_temper, r.n_substeps

    t_thermal, (tend, nsub) = timed(
        lambda: thermal_only(dt, temper1_0, de, state.ndens, ion_mid,
                             rates.phiheat, ccf))
    print(f"# t_thermal={t_thermal*1e3:.1f} ms  lockstep nsub={int(nsub)}",
          flush=True)

    # one coolin evaluation on the full grid (per-sub-step cost)
    @jax.jit
    def coolin_only(nd, de_, ion, T):
        return coolin(cooling, nd, de_, ion.avg.h0, ion.avg.h1,
                      ion.avg.he0, ion.avg.he1, ion.avg.he2, T)

    t_coolin, _ = timed(
        lambda: coolin_only(state.ndens, de, ion_mid, temper1_0), n=10)
    print(f"# t_coolin(1 eval)={t_coolin*1e3:.2f} ms", flush=True)

    rc_jit = jax.jit(lambda T: rate_coefficients(T))
    t_rates, _ = timed(lambda: rc_jit(avg_t_0), n=10)
    print(f"# t_rates(1 eval)={t_rates*1e3:.2f} ms", flush=True)

    print(json.dumps(dict(
        mesh=mesh, n_src=n_src, backend=jax.default_backend(),
        t_trip_ms=t_trip * 1e3, t_doric_ms=t_doric * 1e3,
        t_thermal_ms=t_thermal * 1e3, nsub=int(nsub),
        t_coolin_ms=t_coolin * 1e3, t_rates_ms=t_rates * 1e3,
        coolin_share=(int(nsub) * t_coolin) / t_trip)), flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
