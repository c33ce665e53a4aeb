"""Benchmark: 3D multi-source radiative-transfer throughput on one chip.

Metric: cell-source updates per second for one full evolve3D iteration
(wavefront sweep over all sources + global chemistry pass) -- the
BASELINE.md north-star metric.  The reference publishes no numbers
(BASELINE.md: "published: {}"), so vs_baseline is reported against our
own recorded first-round value when available, else 1.0.

Fail-safe structure (round-2 postmortem): each configuration runs in
its own subprocess so a device fault in one cannot take down the
others; if the default adaptive-node quadrature ("auto") faults, the
config is retried with the proven fixed 8-node rule and the JSON
records which path produced the number.  Exactly one JSON line is
always printed, even on partial failure.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

MESH = int(os.environ.get("BENCH_MESH", 128))
N_SRC = int(os.environ.get("BENCH_SOURCES", 8))
N_ITER = int(os.environ.get("BENCH_ITERS", 2))
# per-config wall clamp: warm-up compile through the device tunnel runs
# ~4-7 min; anything past this is a hang, not a slow compile
TIMEOUT_S = float(os.environ.get("BENCH_TIMEOUT_S", 1500))
# round-1 recorded value of the SAME isothermal config on 1 TPU chip
# (BENCH_r01.json / BASELINE.md "Measured"): vs_baseline tracks our own
# progression because the reference publishes no numbers
REFERENCE_VALUE = float(os.environ.get("BENCH_BASELINE", 68696824.6))


def _bench_one(isothermal: bool, n_nodes="auto"):
    """One config, in-process: build tables, compile, time N_ITER
    full evolve3D iterations, return cell-source updates/s."""
    import jax
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
    dr = 50.0 * const.kpc / MESH
    sweep_cfg = SweepConfig(tables=tables, mesh=MESH, dr=dr,
                            isothermal=isothermal,
                            flux_scale=bands.flux_scale)
    cooling = None if isothermal else setup_cooling_tables(dtype=dtype)
    chem_cfg = ChemistryConfig(cooling=cooling, isothermal=isothermal,
                               isothermal_temperature=1.0e4)
    shells = build_shell_table(MESH)
    cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem_cfg, shells=shells)
    iteration = make_evolve3d_iteration(cfg)

    rng = np.random.RandomState(7)
    srcpos = jnp.asarray(rng.randint(0, MESH, size=(N_SRC, 3)),
                         dtype=jnp.int32)
    nflux = jnp.asarray(
        np.concatenate([rng.uniform(0.5, 2.0, (N_SRC, 1)),
                        np.zeros((N_SRC, 2))], axis=1), dtype=dtype)
    state = initial_grid_state(np.full((MESH,) * 3, 1.0e-4), 0.0, 0.0, 0.0,
                               1.0e4, dtype=dtype)
    dt = jnp.asarray(1.0e14, dtype=dtype)

    # warm-up / compile
    state1, conv, _, _ = iteration(state, srcpos, nflux, dt)
    jax.block_until_ready(state1.h_av1)

    t0 = time.perf_counter()
    s = state
    for _ in range(N_ITER):
        s, conv, _, _ = iteration(s, srcpos, nflux, dt)
    jax.block_until_ready(s.h_av1)
    elapsed = time.perf_counter() - t0

    updates = MESH**3 * N_SRC * N_ITER
    return updates / elapsed


def _run_config(isothermal: bool):
    """Run one config in a subprocess; the default fixed 8-node rule
    first (the on-chip A/B winner, radiation/quadrature.py
    DEFAULT_NODES), the adaptive band blocks as fallback.  Returns
    (rate_or_None, quad_path, error_or_None)."""
    for nodes in ("8", "auto"):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--one", "iso" if isothermal else "heat", nodes]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=TIMEOUT_S, cwd=HERE)
        except subprocess.TimeoutExpired:
            err = f"timeout after {TIMEOUT_S:.0f}s (nodes={nodes})"
            continue
        if p.returncode == 0:
            for line in reversed(p.stdout.strip().splitlines()):
                if line.startswith("RATE "):
                    return float(line.split()[1]), nodes, None
            err = f"no RATE line (nodes={nodes}): {p.stdout[-300:]}"
        else:
            err = (f"rc={p.returncode} (nodes={nodes}): "
                   + (p.stderr or p.stdout)[-500:].replace("\n", " | "))
    return None, None, err


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        # subprocess entry: one config, one RATE line
        isothermal = sys.argv[2] == "iso"
        nodes = sys.argv[3]
        rate = _bench_one(isothermal,
                          n_nodes="auto" if nodes == "auto" else int(nodes))
        print(f"RATE {rate!r}")
        return

    rate, iso_path, iso_err = _run_config(isothermal=True)
    if os.environ.get("BENCH_SKIP_HEATING"):
        heating_rate, heat_path, heat_err = 0.0, "skipped", None
    else:
        heating_rate, heat_path, heat_err = _run_config(isothermal=False)

    value = rate if rate is not None else 0.0
    vs_baseline = (value / REFERENCE_VALUE) if REFERENCE_VALUE > 0 else 1.0
    out = {
        "metric": f"cell_source_updates_per_s_mesh{MESH}_src{N_SRC}",
        "value": value,
        "unit": "cell-source-updates/s",
        "vs_baseline": vs_baseline,
        "heating_value": heating_rate if heating_rate is not None else 0.0,
        "heating_metric": ("cell-source-updates/s, non-isothermal "
                           "(47-band heating + sub-cycled thermal)"),
        "quad_path": {"isothermal": iso_path, "heating": heat_path},
    }
    errors = {k: v for k, v in
              (("isothermal", iso_err), ("heating", heat_err)) if v}
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
