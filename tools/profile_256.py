"""Bisect the 256^3 x 8 throughput regression (VERDICT r4 weak #2).

Round 4's chunked source batching made 256^3 x 8 run at all (the plain
vmapped batch OOMs at ~26 GB), but at 23.2M cell-source-updates/s --
3x below round 1's 74.8M at 256^3 x 4 (plain vmap) and the 128^3 rate.
This tool separates the suspects on-chip:

  - sweep-only wall at source chunk sizes {2, 4, 8-if-it-fits}
  - the plain-vmap 4-source case (the round-1 datum) for comparison
  - chemistry-only wall at 16.7M cells (in-graph isothermal pass)
  - the fused full iteration (what bench.py measures)

Usage: python tools/profile_256.py [mesh] [n_src]
Prints one JSON line (tracked in BASELINE.md).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(mesh=256, n_src=8):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from c2ray_tpu import constants as const
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep import SweepConfig, build_shell_table
    from c2ray_tpu.sweep.evolve3d import (Evolve3DConfig,
                                          make_evolve3d_iteration)
    from c2ray_tpu.sweep.global_pass import (ChemistryConfig,
                                             global_chemistry_pass)
    from c2ray_tpu.sweep.pyramid_sweep import sweep_pyramid_source_batch
    from c2ray_tpu.sweep.source_sweep import RateGrids, SourceFields

    dtype = jnp.float32
    n = mesh ** 3
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
        isothermal=True, dtype=dtype)
    dr = 50.0 * const.kpc / mesh
    base_cfg = SweepConfig(tables=tables, mesh=mesh, dr=dr,
                           isothermal=True,
                           flux_scale=bands.flux_scale)
    rng = np.random.RandomState(7)
    srcpos = jnp.asarray(rng.randint(0, mesh, size=(n_src, 3)),
                         dtype=jnp.int32)
    nflux = jnp.asarray(
        np.concatenate([rng.uniform(0.5, 2.0, (n_src, 1)),
                        np.zeros((n_src, 2))], axis=1), dtype=dtype)
    state = begin_timestep(initial_grid_state(
        np.full((mesh,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4,
        dtype=dtype))
    fields = SourceFields(ndens=state.ndens, h_av0=state.h_av0,
                          h_av1=state.h_av1, he_av0=state.he_av0,
                          he_av1=state.he_av1)
    drj = jnp.asarray(dr, dtype=dtype)
    vos = jnp.asarray(dr ** 3 / base_cfg.flux_scale, dtype=dtype)
    dt = jnp.asarray(1.0e14, dtype=dtype)

    out = {"mesh": mesh, "n_src": n_src,
           "backend": jax.default_backend()}

    def timed_sweep(cfg, sp, nf, label, n_iter=2):
        sweep = jax.jit(lambda sp_, nf_, d, v: sweep_pyramid_source_batch(
            cfg, fields, sp_, nf_, radius=None, dr=d,
            vol_over_scale=v).phih)
        try:
            r = sweep(sp, nf, drj, vos)
            jax.block_until_ready(r)
        except Exception as e:  # OOM etc: record and move on
            out[label] = {"error": str(e)[:200]}
            print(f"# {label}: FAILED {str(e)[:120]}", flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(n_iter):
            r = sweep(sp, nf, drj, vos)
        jax.block_until_ready(r)
        t = (time.perf_counter() - t0) / n_iter
        rate = n * sp.shape[0] / t
        out[label] = {"seconds": t, "rate_per_s": rate}
        print(f"# {label}: {t:.3f} s -> {rate/1e6:.1f}M updates/s",
              flush=True)

    # sweep-only at chunk 2 (the shipped auto), 4, 8 (plain vmap)
    for chunk in (2, 4, 8):
        cfg = dataclasses.replace(base_cfg, source_chunk=chunk)
        timed_sweep(cfg, srcpos, nflux, f"sweep_chunk{chunk}")

    # round-1 datum: 4 sources, plain vmap
    timed_sweep(dataclasses.replace(base_cfg, source_chunk=4),
                srcpos[:4], nflux[:4], "sweep_4src_vmap")

    # chemistry-only at 16.7M cells (isothermal in-graph pass)
    chem_cfg = ChemistryConfig(cooling=None, isothermal=True,
                               isothermal_temperature=1.0e4)
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-16, -11, n).astype("f4")),
        phihe0=jnp.asarray(10 ** rng.uniform(-17, -12, n).astype("f4")),
        phihe1=jnp.asarray(10 ** rng.uniform(-18, -13, n).astype("f4")),
        phiheat=jnp.zeros(n, dtype),
        photon_loss=jnp.zeros((), dtype),
        lls_loss=jnp.zeros((), dtype))
    chem = jax.jit(lambda st, rt: global_chemistry_pass(
        chem_cfg, st, rt, dt, host_loop=False))
    s1, conv = chem(state, rates)
    jax.block_until_ready(s1.h_av1)
    t0 = time.perf_counter()
    s1, conv = chem(state, rates)
    jax.block_until_ready(s1.h_av1)
    t_chem = time.perf_counter() - t0
    out["chem_only"] = {"seconds": t_chem}
    print(f"# chem_only: {t_chem:.3f} s", flush=True)

    # the fused full iteration at the best chunk
    best_chunk = min(
        (v["seconds"], int(k.split("chunk")[1]))
        for k, v in out.items()
        if k.startswith("sweep_chunk") and "seconds" in v)[1]
    cfg = dataclasses.replace(base_cfg, source_chunk=best_chunk)
    ecfg = Evolve3DConfig(sweep=cfg, chem=chem_cfg,
                          shells=build_shell_table(mesh))
    it = make_evolve3d_iteration(ecfg)
    s1, conv, _, _ = it(state, srcpos, nflux, dt)
    jax.block_until_ready(s1.h_av1)
    t0 = time.perf_counter()
    s = state
    for _ in range(2):
        s, conv, _, _ = it(s, srcpos, nflux, dt)
    jax.block_until_ready(s.h_av1)
    t_full = (time.perf_counter() - t0) / 2
    out["full_iteration"] = {"seconds": t_full,
                             "rate_per_s": n * n_src / t_full,
                             "chunk": best_chunk}
    print(f"# full iteration (chunk {best_chunk}): {t_full:.3f} s -> "
          f"{n*n_src/t_full/1e6:.1f}M updates/s", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
