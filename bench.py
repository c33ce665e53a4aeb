"""Benchmark: 3D multi-source radiative-transfer throughput on one chip.

Metric: cell-source updates per second for one full evolve3D iteration
(wavefront sweep over all sources + global chemistry pass) -- the
BASELINE.md north-star metric.  The reference publishes no numbers
(BASELINE.md: "published: {}"), so vs_baseline is reported against our
own recorded first-round value.

Budgeted, fail-safe structure (round-3 postmortem):

- a TOTAL wall budget is taken from ``BENCH_DEADLINE_S`` (default
  1700 s) and every subprocess timeout is derated from the remaining
  budget, so the bench always finishes and prints before a harness
  kill;
- each configuration runs in its own subprocess so a device fault in
  one cannot take down the others;
- the isothermal JSON line is printed AND FLUSHED the moment that
  config lands -- a later kill can no longer lose an already-measured
  number (the final, most complete JSON line is printed last; consumers
  taking the last parseable line get the best available result);
- a *timeout* is never retried with the slower "auto" quadrature path
  (only a fault is, and only if budget remains);
- the heating config is sized to the remaining budget: 128^3 when
  there is room, else 64^3 -- a recorded smaller number beats a dead
  artifact; the metric labels the config actually run.

Prints one JSON line per landed stage; the last line is the complete
result:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

T_START = time.time()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 1700))
MESH = int(os.environ.get("BENCH_MESH", 128))
N_SRC = int(os.environ.get("BENCH_SOURCES", 8))
# 4 iterations: a real evolve3D timestep runs 3-6 convergence
# iterations, and individual pass difficulty is bimodal (an evolved
# state can tip a cell minority into the fixed point's >1%
# oscillation regime and that pass then runs toward the 400-iteration
# cap -- the same per-cell cap the reference runs).  Averaging 4
# passes makes the headline represent the loop, not one pass's luck.
N_ITER = int(os.environ.get("BENCH_ITERS", 4))
# >= 2 iterations so the headline heating number is never a single
# multi-second sample through the tunnel (VERDICT r4 weak #6)
HEAT_ITERS = int(os.environ.get("BENCH_HEAT_ITERS", 4))
# round-1 recorded value of the SAME isothermal config on 1 TPU chip
# (BENCH_r01.json / BASELINE.md "Measured"): vs_baseline tracks our own
# progression because the reference publishes no numbers
REFERENCE_VALUE = float(os.environ.get("BENCH_BASELINE", 68696824.6))
# persistent XLA compile cache: the dominant cost of a cold config is
# the 4-7 min compile through the device tunnel; caching it makes
# every subsequent bench run (and the fault-retry path) fit easily
CACHE_DIR = os.environ.get("BENCH_CACHE_DIR",
                           os.path.join(HERE, ".jax_cache"))


def _remaining():
    return DEADLINE_S - (time.time() - T_START)


def _bench_one(isothermal: bool, mesh: int, n_iter: int, n_nodes="auto"):
    """One config, in-process: build tables, compile, time n_iter
    full evolve3D iterations, return cell-source updates/s."""
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from c2ray_tpu import constants as const
    from c2ray_tpu.cooling import setup_cooling_tables
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.state import initial_grid_state
    from c2ray_tpu.sweep import SweepConfig, build_shell_table
    from c2ray_tpu.sweep.evolve3d import (Evolve3DConfig,
                                          make_evolve3d_iteration)
    from c2ray_tpu.sweep.global_pass import ChemistryConfig

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64

    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
        isothermal=isothermal, dtype=dtype, n_nodes=n_nodes)
    dr = 50.0 * const.kpc / mesh
    sweep_cfg = SweepConfig(tables=tables, mesh=mesh, dr=dr,
                            isothermal=isothermal,
                            flux_scale=bands.flux_scale)
    cooling = None if isothermal else setup_cooling_tables(dtype=dtype)
    chem_cfg = ChemistryConfig(cooling=cooling, isothermal=isothermal,
                               isothermal_temperature=1.0e4)
    shells = build_shell_table(mesh)
    cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem_cfg, shells=shells)
    iteration = make_evolve3d_iteration(cfg)

    rng = np.random.RandomState(7)
    srcpos = jnp.asarray(rng.randint(0, mesh, size=(N_SRC, 3)),
                         dtype=jnp.int32)
    nflux = jnp.asarray(
        np.concatenate([rng.uniform(0.5, 2.0, (N_SRC, 1)),
                        np.zeros((N_SRC, 2))], axis=1), dtype=dtype)
    state = initial_grid_state(np.full((mesh,) * 3, 1.0e-4), 0.0, 0.0, 0.0,
                               1.0e4, dtype=dtype)
    dt = jnp.asarray(1.0e14, dtype=dtype)

    # warm-up / compile.  Heating passes visit a data-dependent subset
    # of the host-loop bucket ladder; pre-building every shape here
    # keeps first-use compilation/deserialization out of the timed
    # iterations (the warm-up iteration alone only covers ITS shapes).
    from c2ray_tpu.sweep.global_pass import warm_host_shapes
    warm_host_shapes(chem_cfg, mesh ** 3)
    print(f"SHAPES-WARM {time.perf_counter():.1f}", flush=True)
    state1, conv, _, _ = iteration(state, srcpos, nflux, dt)
    jax.block_until_ready(state1.h_av1)
    print(f"WARM {time.perf_counter():.1f}", flush=True)

    t0 = time.perf_counter()
    s = state
    for _ in range(n_iter):
        s, conv, _, _ = iteration(s, srcpos, nflux, dt)
    jax.block_until_ready(s.h_av1)
    elapsed = time.perf_counter() - t0

    updates = mesh**3 * N_SRC * n_iter
    return updates / elapsed, elapsed / n_iter


def _run_config(isothermal: bool, mesh: int, n_iter: int, reserve: float):
    """Run one config in a subprocess under the remaining budget.

    Quadrature: the fixed 6-node rule first (the round-5 A/B winner:
    3.7e-6 of the dense reference at 25% fewer exp terms than 8,
    radiation/quadrature.py DEFAULT_NODES).  A FAULT (rc != 0) is
    retried once with the 8-node rule if budget remains; a TIMEOUT is
    never retried.  Returns (rate, secs_per_iter, quad, error).
    """
    err = None
    for nodes in ("6", "8"):
        budget = _remaining() - reserve
        if budget < 120:
            return None, None, None, (err or "") + " | no budget left"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--one", "iso" if isothermal else "heat", nodes,
               str(mesh), str(n_iter)]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=budget, cwd=HERE)
        except subprocess.TimeoutExpired:
            err = ((err + " | " if err else "")
                   + f"timeout after {budget:.0f}s (nodes={nodes})")
            return None, None, None, err  # never retry a timeout
        if p.returncode == 0:
            for line in reversed(p.stdout.strip().splitlines()):
                if line.startswith("RATE "):
                    _, r, spi = line.split()
                    return float(r), float(spi), nodes, None
            err = f"no RATE line (nodes={nodes}): {p.stdout[-300:]}"
        else:
            err = ((err + " | " if err else "")
                   + f"rc={p.returncode} (nodes={nodes}): "
                   + (p.stderr or p.stdout)[-400:].replace("\n", " | "))
    return None, None, None, err


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        # subprocess entry: one config, one RATE line
        isothermal = sys.argv[2] == "iso"
        nodes = sys.argv[3]
        mesh = int(sys.argv[4])
        n_iter = int(sys.argv[5])
        rate, spi = _bench_one(
            isothermal, mesh, n_iter,
            n_nodes="auto" if nodes == "auto" else int(nodes))
        print(f"RATE {rate!r} {spi!r}", flush=True)
        return

    out = {
        "metric": f"cell_source_updates_per_s_mesh{MESH}_src{N_SRC}",
        "value": 0.0,
        "unit": "cell-source-updates/s",
        "vs_baseline": 0.0,
        "heating_value": 0.0,
        "heating_metric": "pending",
    }
    errors = {}

    # --- stage 1: isothermal (reserve ~5 min of budget for heating) ---
    rate, iso_spi, iso_quad, iso_err = _run_config(
        isothermal=True, mesh=MESH, n_iter=N_ITER, reserve=300.0)
    if rate is not None:
        out["value"] = rate
        out["vs_baseline"] = (rate / REFERENCE_VALUE
                              if REFERENCE_VALUE > 0 else 1.0)
        out["seconds_per_iteration"] = iso_spi
        out["quad_path"] = {"isothermal": iso_quad}
    else:
        errors["isothermal"] = iso_err
    # flush the isothermal result immediately: a later kill cannot lose it
    print(json.dumps(out), flush=True)

    # --- stage 2: heating, sized to the remaining budget ---
    if os.environ.get("BENCH_SKIP_HEATING"):
        out["heating_metric"] = "skipped"
    else:
        heat_mesh = MESH
        if _remaining() < 700:
            heat_mesh = min(MESH, 64)
        hrate, h_spi, h_quad, h_err = _run_config(
            isothermal=False, mesh=heat_mesh, n_iter=HEAT_ITERS,
            reserve=30.0)
        if hrate is None and heat_mesh > 64 and _remaining() > 400:
            # a smaller config, not a slower path: drop to 64^3
            errors["heating_%d" % heat_mesh] = h_err
            heat_mesh = 64
            hrate, h_spi, h_quad, h_err = _run_config(
                isothermal=False, mesh=heat_mesh, n_iter=HEAT_ITERS,
                reserve=30.0)
        if hrate is not None:
            out["heating_value"] = hrate
            out["heating_metric"] = (
                f"cell-source-updates/s, non-isothermal, mesh{heat_mesh}_"
                f"src{N_SRC} (47-band heating + sub-cycled thermal)")
            out["heating_seconds_per_iteration"] = h_spi
            out.setdefault("quad_path", {})["heating"] = h_quad
        else:
            errors["heating"] = h_err

    if errors:
        out["errors"] = errors
    out["bench_wall_s"] = time.time() - T_START
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
