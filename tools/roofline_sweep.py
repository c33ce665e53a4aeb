"""Settle the isothermal sweep roofline (VERDICT r4 weak #3).

The isothermal 128^3 x 8 number has sat at ~69M cell-source-updates/s
for four rounds.  This tool answers, with measurements, whether that
is the chip's ceiling for this non-matmul workload:

1. measure the shipped full-trace sweep (isothermal + heating);
2. measure the VPU transcendental peak with a pure exp microbenchmark
   shaped like the sweep's inner rate evaluation;
3. count the sweep's live exp terms -> achieved fraction of the exp
   roof;
4. A/B reduced-work rules: fixed K=6 and K=5 Gauss-Legendre nodes per
   band vs the shipped K=8, with the accuracy pinned against a dense
   48-node reference over tau in [1e-8, 1e7] (the same harness as
   tests/test_quadrature_pin.py).

Usage: python tools/roofline_sweep.py [mesh] [n_src]
Prints one JSON line (tracked in BASELINE.md).  Reference integrand:
radiation_tables.f90:593-660.
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
    return (time.perf_counter() - t0) / n


def accuracy_vs_dense(n_nodes, isothermal, dense=48):
    """Max relative error of the K-node rule vs a dense reference over
    the full tau range.  MUST run under f64 (jax_enable_x64 + CPU):
    the 1e48-scale photon rates overflow f32 and the comparison NaNs
    -- main() therefore shells out to `--accuracy` with the right
    env."""
    import jax.numpy as jnp

    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import (build_quadrature_tables,
                                                photoion_rates_quad)

    sed = SEDConfig(bb=BlackBodySED(T_eff=5.0e4, S_star=1.0e48))
    cd_in = np.logspace(10.0, 24.5, 60)
    dcol = 0.03 * cd_in + 1.0e10
    cols = (jnp.asarray(cd_in), jnp.asarray(cd_in + dcol),
            jnp.asarray(0.08 * cd_in), jnp.asarray(0.08 * (cd_in + dcol)),
            jnp.asarray(0.008 * cd_in),
            jnp.asarray(0.008 * (cd_in + dcol)))
    one = jnp.ones(60)
    half = jnp.full(60, 0.5)

    def rates(K):
        qt, _, _ = build_quadrature_tables(
            sed, isothermal=isothermal, n_nodes=K, flux_scale=1.0,
            dtype=jnp.float64)
        return photoion_rates_quad(qt, *cols, one, half, nflux_bb=one,
                                   do_heating=not isothermal)

    ref = rates(dense)
    test = rates(n_nodes)
    errs = {}
    for name in ("photo_cell_HI", "photo_cell_HeI", "photo_cell_HeII",
                 "heat"):
        r = np.asarray(getattr(ref, name))
        t = np.asarray(getattr(test, name))
        if r.size == 0 or np.all(r == 0):
            continue
        scale = np.maximum(np.abs(r), np.abs(r).max() * 1e-12)
        errs[name] = float(np.max(np.abs(t - r) / scale))
    return max(errs.values()), errs


def main(mesh=128, n_src=8):
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(os.path.dirname(__file__), "..",
                                        ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from c2ray_tpu import constants as const
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep import SweepConfig
    from c2ray_tpu.sweep.pyramid_sweep import sweep_pyramid_source_batch
    from c2ray_tpu.sweep.source_sweep import SourceFields

    dtype = jnp.float32
    out = {"mesh": mesh, "n_src": n_src,
           "backend": jax.default_backend()}

    # --- 2. exp-issue peak: z = sum_k exp(-a_k x) shaped like the
    # rate kernel's attenuation sums, big enough to hide overheads
    n = mesh ** 3
    terms = 64
    x = jnp.asarray(np.random.RandomState(0).rand(n), dtype=dtype)
    a = jnp.asarray(np.linspace(0.5, 3.0, terms), dtype=dtype)

    @jax.jit
    def expbench(x):
        return jnp.exp(-x[:, None] * a).sum(-1)

    t_exp = timed(expbench, x, n=5)
    exp_rate = n * terms / t_exp
    out["exp_peak_per_s"] = exp_rate
    print(f"# exp peak: {exp_rate/1e9:.1f} Gexp/s "
          f"({n*terms/1e6:.0f}M exps in {t_exp*1e3:.1f} ms)", flush=True)

    rng = np.random.RandomState(7)
    srcpos = jnp.asarray(rng.randint(0, mesh, size=(n_src, 3)),
                         dtype=jnp.int32)
    nflux = jnp.asarray(
        np.concatenate([rng.uniform(0.5, 2.0, (n_src, 1)),
                        np.zeros((n_src, 2))], axis=1), dtype=dtype)
    state = begin_timestep(initial_grid_state(
        np.full((mesh,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4,
        dtype=dtype))

    # --- 1 + 4. sweep rate at K in {8, 6, 5}, isothermal + heating
    for iso in (True, False):
        for K in (8, 6, 5):
            tables, sed, bands = build_quadrature_tables(
                SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
                isothermal=iso, dtype=dtype, n_nodes=K)
            dr = 50.0 * const.kpc / mesh
            cfg = SweepConfig(tables=tables, mesh=mesh, dr=dr,
                              isothermal=iso,
                              flux_scale=bands.flux_scale)
            drj = jnp.asarray(dr, dtype=dtype)
            vos = jnp.asarray(dr ** 3 / cfg.flux_scale, dtype=dtype)

            fields = SourceFields(ndens=state.ndens, h_av0=state.h_av0,
                                  h_av1=state.h_av1,
                                  he_av0=state.he_av0,
                                  he_av1=state.he_av1)
            sweep = jax.jit(lambda sp, nf, d, v, c=cfg, f=fields:
                            sweep_pyramid_source_batch(
                                c, f, sp, nf, radius=None, dr=d,
                                vol_over_scale=v).phih)
            t = timed(sweep, srcpos, nflux, drj, vos, n=3)
            rate = n * n_src / t
            nlive = tables.bb.sigma_hat.shape[0]
            # per cell-stage: nlive*K exps each for E_in and E_out
            exps_per_cell = nlive * K * 2
            frac = (rate * exps_per_cell) / exp_rate
            key = f"{'iso' if iso else 'heat'}_K{K}"
            out[key] = {"sweep_s": t, "rate_per_s": rate,
                        "live_bands": nlive, "exp_terms": exps_per_cell,
                        "frac_of_exp_roof": frac}
            print(f"# {key}: {t:.3f} s -> {rate/1e6:.1f}M updates/s, "
                  f"{nlive} live bands x {K} nodes "
                  f"({exps_per_cell} exps/cell) = "
                  f"{frac*100:.0f}% of exp roof", flush=True)

    # --- 4b. accuracy of the reduced rules: needs f64, so run in a
    # CPU+x64 subprocess (this process holds the TPU in f32)
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_ENABLE_X64="true")
    for K in (6, 5):
        for iso in (True, False):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--accuracy", str(K), "1" if iso else "0"],
                capture_output=True, text=True, env=env, timeout=600)
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("{")]
            res = (json.loads(line[-1]) if line
                   else {"error": r.stderr[-200:]})
            out[f"accuracy_K{K}_{'iso' if iso else 'heat'}"] = res
            print(f"# accuracy K={K} {'iso' if iso else 'heat'}: "
                  f"{res}", flush=True)

    print(json.dumps(out), flush=True)


def accuracy_main(K, iso):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    maxerr, errs = accuracy_vs_dense(K, iso)
    print(json.dumps({"max_rel_err_vs_48node": maxerr,
                      "fields": errs}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--accuracy":
        accuracy_main(int(sys.argv[2]), sys.argv[3] == "1")
    else:
        a = [int(x) for x in sys.argv[1:]]
        main(*a)
