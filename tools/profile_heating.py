"""Profile the non-isothermal (heating) evolve3D iteration on-chip.

Round-3 landed heating on the TPU (host-driven chemistry loop) but the
throughput story lived in commit messages.  This tool measures, at the
bench config (mesh^3 x N_SRC, BB 5e4 K), the split the verdict asked
for:

  - sweep wall time per iteration (the 47-band heating pyramid sweep)
  - chemistry wall time per iteration: host-loop trips, per-trip cost,
    the compaction crossover trip, thermal sub-step counts per trip
  - the resulting end-to-end cell-source-updates/s vs the isothermal
    rate

Usage: python tools/profile_heating.py [mesh] [n_src] [n_iter]
Writes a JSON summary line at the end (tracked in BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(mesh=128, n_src=8, n_iter=2):
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(os.path.dirname(__file__), "..",
                                        ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from c2ray_tpu import constants as const
    from c2ray_tpu.cooling import setup_cooling_tables
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep import SweepConfig, build_shell_table
    from c2ray_tpu.sweep import global_pass as gp
    from c2ray_tpu.sweep.evolve3d import Evolve3DConfig
    from c2ray_tpu.sweep.global_pass import (ChemistryConfig,
                                             global_chemistry_pass)
    from c2ray_tpu.sweep.pyramid_sweep import sweep_pyramid_source_batch
    from c2ray_tpu.sweep.source_sweep import SourceFields

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64

    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
        isothermal=False, dtype=dtype, n_nodes=8)
    dr = 50.0 * const.kpc / mesh
    sweep_cfg = SweepConfig(tables=tables, mesh=mesh, dr=dr,
                            isothermal=False,
                            flux_scale=bands.flux_scale)
    chem_cfg = ChemistryConfig(cooling=setup_cooling_tables(dtype=dtype),
                               isothermal=False)
    cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem_cfg,
                         shells=build_shell_table(mesh))

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

    # instrument the host loop: wrap _host_body's jitted callable to
    # record per-trip walls + counts
    trips = []
    real_host_body = gp._host_body

    def instrumented_host_body(c, k=1):
        body = real_host_body(c, k)

        def timed(*args):
            t0 = time.perf_counter()
            out, cnt = body(*args)
            jax.block_until_ready(out[1])
            trips.append((time.perf_counter() - t0, int(cnt),
                          int(args[-1][3].size)))
            return out, cnt

        return timed

    gp._host_body = instrumented_host_body

    real_split_trip = gp._split_trip

    def instrumented_split_trip(c, s0, dt_, args_, ccf_, nit0_, carry_):
        t0 = time.perf_counter()
        out, cnt = real_split_trip(c, s0, dt_, args_, ccf_, nit0_,
                                   carry_)
        jax.block_until_ready(out[1])
        trips.append((time.perf_counter() - t0, int(cnt),
                      int(args_[0].size)))
        return out, cnt

    gp._split_trip = instrumented_split_trip

    summary = {"mesh": mesh, "n_src": n_src,
               "backend": jax.default_backend()}
    try:
        iters = []
        for it in range(n_iter + 1):  # +1 warm-up/compile
            t0 = time.perf_counter()
            rates = sweep_jit(state, srcpos, nflux, drj, vos)
            jax.block_until_ready(rates.phih)
            t_sweep = time.perf_counter() - t0

            trips.clear()
            t0 = time.perf_counter()
            state, conv = global_chemistry_pass(chem_cfg, state, rates,
                                                dt, host_loop=True)
            jax.block_until_ready(state.h_av1)
            t_chem = time.perf_counter() - t0

            sizes = [s for _, _, s in trips]
            compact_at = next(
                (i for i, s in enumerate(sizes) if s < sizes[0]), None)
            rec = dict(sweep_s=t_sweep, chem_s=t_chem,
                       trips=len(trips), conv=int(conv),
                       trip_detail=[(round(t * 1e3, 1), c, s)
                                    for t, c, s in trips],
                       trip_ms_first=(trips[0][0] * 1e3 if trips
                                      else 0.0),
                       trip_ms_median=float(np.median(
                           [t for t, _, _ in trips]) * 1e3),
                       compact_crossover_trip=compact_at,
                       active_after_1=(trips[0][1] if trips else 0))
            phase = "warmup" if it == 0 else f"iter{it}"
            print(f"# {phase}: sweep {t_sweep:.3f}s chem {t_chem:.3f}s "
                  f"({rec['trips']} trips, median "
                  f"{rec['trip_ms_median']:.1f} ms, compacted at trip "
                  f"{compact_at})", flush=True)
            print("#   trips (ms, active_after, set_size): "
                  + " ".join(f"({t},{c},{s})"
                             for t, c, s in rec["trip_detail"]),
                  flush=True)
            if it > 0:
                iters.append(rec)

        tot = sum(r["sweep_s"] + r["chem_s"] for r in iters)
        upd = mesh ** 3 * n_src * len(iters)
        summary.update(
            rate=upd / tot,
            sweep_s_per_iter=float(np.mean([r["sweep_s"]
                                            for r in iters])),
            chem_s_per_iter=float(np.mean([r["chem_s"]
                                           for r in iters])),
            trips_per_iter=float(np.mean([r["trips"] for r in iters])),
            trip_ms_median=float(np.mean([r["trip_ms_median"]
                                          for r in iters])),
            compact_crossover=[r["compact_crossover_trip"]
                               for r in iters],
        )
    finally:
        gp._host_body = real_host_body
        gp._split_trip = real_split_trip

    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
