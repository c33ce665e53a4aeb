"""On-chip f32 HEATING physics check: non-isothermal 3D run vs CPU f64.

Round-3 made the non-isothermal chemistry run on the chip (host-driven
loop, MXU cooling interpolation) but only the isothermal path had an
on-chip physics check (tpu_stromgren_check.py).  This tool closes that
gap: it runs the same single-source photo-heating problem (1e5 K BB in
a uniform medium -- the Test-2-style setup, files_for_1D/inputs/
MP_TEST_2B.in; analytic-front machinery files_for_1D/output.f90:337-385)
on the current backend (TPU, f32) and on a CPU f64 subprocess, then
compares the spherically-averaged ionization and temperature profiles.

Usage:
  python tools/tpu_heating_check.py [mesh]            # full check
  python tools/tpu_heating_check.py --profile OUT.npz [mesh]
                                                      # one backend only

Prints per-shell comparison stats and a final PASS/FAIL.
Tolerances (recorded in BASELINE.md): front radius 5%, in-front
temperature 10% (f32 vs f64 through ~1e3 stiff chemistry iterations).
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_STEPS = 6


def run_profile(mesh):
    """Run the heating problem on the current backend; return radii
    (cell units), shell-averaged x_HII and T, and wall seconds."""
    import time

    import jax
    import jax.numpy as jnp

    from c2ray_tpu import constants as const
    from c2ray_tpu.cooling import setup_cooling_tables
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.state import initial_grid_state
    from c2ray_tpu.sweep import SweepConfig, build_shell_table
    from c2ray_tpu.sweep.evolve3d import Evolve3DConfig, evolve3d
    from c2ray_tpu.sweep.global_pass import ChemistryConfig

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64

    ndens_val = 1.0e-3
    S_star = 5.0e48
    T0 = 100.0
    box = 16.0 * const.kpc

    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=1e5, S_star=S_star)),
        isothermal=False, dtype=dtype)
    sweep_cfg = SweepConfig(tables=tables, mesh=mesh, dr=box / mesh,
                            isothermal=False,
                            flux_scale=bands.flux_scale)
    chem = ChemistryConfig(cooling=setup_cooling_tables(dtype=dtype),
                           isothermal=False)
    cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem,
                         shells=build_shell_table(mesh))

    state = initial_grid_state(np.full((mesh,) * 3, ndens_val),
                               0.0, 0.0, 0.0, T0, dtype=dtype)
    src = jnp.asarray([[mesh // 2] * 3], dtype=jnp.int32)
    nflux = jnp.asarray([[1.0, 0.0, 0.0]], dtype=dtype)
    dt = 5.0e5 * const.YEAR

    t0 = time.perf_counter()
    cache = {}
    for step in range(N_STEPS):
        state, stats = evolve3d(cfg, state, src, nflux,
                                jnp.asarray(dt, dtype=dtype),
                                iteration_cache=cache)
        print(f"# [{jax.default_backend()}] step {step + 1}: "
              f"iters={stats.n_iterations} "
              f"subbox={stats.subbox_radius}", flush=True)
    wall = time.perf_counter() - t0

    x = np.asarray(state.h1, np.float64).reshape(mesh, mesh, mesh)
    T = np.asarray(state.t_final, np.float64).reshape(mesh, mesh, mesh)
    c = mesh // 2
    ii = np.arange(mesh) - c
    r = np.sqrt(ii[:, None, None] ** 2 + ii[None, :, None] ** 2
                + ii[None, None, :] ** 2)
    nbins = mesh // 2
    shell = np.clip(r.astype(np.int64), 0, nbins - 1).ravel()
    cnt = np.bincount(shell, minlength=nbins)
    x_prof = np.bincount(shell, weights=x.ravel(),
                         minlength=nbins) / cnt
    t_prof = np.bincount(shell, weights=T.ravel(),
                         minlength=nbins) / cnt
    return np.arange(nbins) + 0.5, x_prof, t_prof, wall


def front_radius(r, x_prof):
    """x_HII = 0.5 crossing by linear interpolation
    (the reference's threshold front locator, output.f90:399-433)."""
    below = np.where(x_prof < 0.5)[0]
    if len(below) == 0 or below[0] == 0:
        return float("nan")
    i = below[0]
    x0, x1 = x_prof[i - 1], x_prof[i]
    return r[i - 1] + (0.5 - x0) / (x1 - x0) * (r[i] - r[i - 1])


def main(argv):
    if argv and argv[0] == "--profile":
        out = argv[1]
        mesh = int(argv[2]) if len(argv) > 2 else 32
        if "--cpu" in argv:
            # the axon TPU plugin IGNORES the JAX_PLATFORMS env var --
            # the backend must be forced in Python before first use
            import jax

            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_enable_x64", True)
        r, x_prof, t_prof, wall = run_profile(mesh)
        np.savez(out, r=r, x=x_prof, t=t_prof, wall=wall)
        print(f"profile -> {out} ({wall:.1f}s)")
        return 0

    mesh = int(argv[0]) if argv else 32
    here = os.path.dirname(os.path.abspath(__file__))
    ref_path = os.path.join(here, f"heating_ref_cpu{mesh}.npz")

    # CPU f64 reference in a subprocess (fresh backend selection)
    if not os.path.exists(ref_path):
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--profile",
             ref_path, str(mesh), "--cpu"]).returncode
        if rc != 0:
            print("FAIL (cpu reference run failed)")
            return 1
    ref = np.load(ref_path)

    r, x_prof, t_prof, wall = run_profile(mesh)
    import jax

    backend = jax.default_backend()

    rf_dev = front_radius(r, x_prof)
    rf_ref = front_radius(ref["r"], ref["x"])
    front_err = abs(rf_dev - rf_ref) / rf_ref

    # temperature inside the front (the heated HII region)
    inside = r < 0.8 * rf_ref
    t_err = np.max(np.abs(t_prof[inside] - ref["t"][inside])
                   / ref["t"][inside])
    # temperature ahead of the front must stay cold on both paths
    outside = r > 1.5 * rf_ref
    t_out_dev = float(np.max(t_prof[outside]))
    t_out_ref = float(np.max(ref["t"][outside]))

    print(f"backend={backend} mesh={mesh} steps={N_STEPS} "
          f"wall={wall:.1f}s (cpu ref {float(ref['wall']):.1f}s)")
    print(f"front radius: {rf_dev:.2f} vs cpu-f64 {rf_ref:.2f} cells "
          f"(err {front_err:.2%}, tol 5%)")
    print(f"T inside front: max rel err {t_err:.2%} (tol 10%); "
          f"T@center {t_prof[0]:.0f} K vs {float(ref['t'][0]):.0f} K")
    print(f"T outside front: {t_out_dev:.0f} K vs {t_out_ref:.0f} K")

    ok = (front_err < 0.05 and t_err < 0.10
          and t_out_dev < 2.0 * max(t_out_ref, 200.0))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
