"""Run the four analytic 1D test problems ON THE TPU BACKEND.

Every other subsystem has an on-chip proof (tpu_stromgren_check,
tpu_heating_check, tpu_run3d_check); this closes the last gap: the 1D
radial scan (onedim/evolve.py) executing on real TPU hardware in f32,
checked against the same analytic fronts the CPU tests pin
(files_for_1D/output.f90:337-385):

  1. constant density      -> classical Stroemgren sphere
  2. 1/r profile           -> LambertW front
  3. 1/r^2 + flat core     -> r_core sqrt(1+2t/t_rec) branch (L~0)
  4. Shapiro-Giroux cosmological -> exponential-integral front

Tolerances are the CPU tests' plus slack for f32 (the 1D scan carries
cumulative columns; f32 keeps the front to a few percent).

Usage: python tools/tpu_1d_check.py   (prints one PASS/FAIL line each
+ a JSON summary)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.join(os.path.dirname(__file__),
                                              "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.grid import RadialGrid
from c2ray_tpu.onedim import OneDProblem, analytic_front, numerical_front
from c2ray_tpu.onedim.driver import OneDRun
from c2ray_tpu.radiation import BlackBodySED, SEDConfig

kpc = const.kpc


def _front_err(problem, grid, sed, t_total, nsteps, **front_kw):
    run = OneDRun.setup(problem, grid, sed)
    for _ in range(nsteps):
        run.step(t_total / nsteps)
    kw = {}
    if front_kw.pop("cosmological", False):
        kw = dict(zred=float(run.clock.zred), t0=run.clock.t0)
    nf = numerical_front(run.grid.x, run.grid.dr,
                         np.asarray(run.state.xh[:, 1]))
    af = analytic_front(problem, run.sed.bb.S_star, run.time, **kw)
    return abs(nf - af) / af, nf, af


def main():
    backend = jax.default_backend()
    print(f"# backend: {backend} ({jax.devices()[0]})", flush=True)

    cases = []

    err, nf, af = _front_err(
        OneDProblem(testnum=1, dens_val=1.0e-3, temper_val=1e4,
                    isothermal=True),
        RadialGrid(r_in=0.0, r_out=10.0 * kpc, mesh=128),
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=5.0e48)),
        120e6 * const.YEAR, 12)
    cases.append(("test1_stromgren", err, 0.07))

    r_core, n_core = 1.0 * kpc, 1.0e-3
    err, nf, af = _front_err(
        OneDProblem(testnum=2, dens_val=n_core, r_core=r_core,
                    temper_val=1e4, isothermal=True),
        RadialGrid(r_in=0.0, r_out=8.0 * kpc, mesh=128),
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=4.8e47)),
        300e6 * const.YEAR, 15)
    cases.append(("test2_lambertw", err, 0.12))

    n_core = 1.2e-3
    S_star = (4.0 * const.pi * n_core**2 * r_core**3 * const.bh00
              * 4.0 / 3.0)
    err, nf, af = _front_err(
        OneDProblem(testnum=3, dens_val=n_core, r_core=r_core,
                    temper_val=1e4, isothermal=True),
        RadialGrid(r_in=0.0, r_out=6.0 * kpc, mesh=128),
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=S_star)),
        300e6 * const.YEAR, 15)
    cases.append(("test3_core", err, 0.22))

    err, nf, af = _front_err(
        OneDProblem(testnum=4, dens_val=1.87e-4 / 1000.0,
                    temper_val=1e4, isothermal=True, zred00=9.0),
        RadialGrid(r_in=0.0, r_out=700.0 * kpc, mesh=128),
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=3.0e50)),
        50.0e6 * const.YEAR, 10, cosmological=True)
    cases.append(("test4_shapiro_giroux", err, 0.17))

    ok = True
    out = {"backend": backend}
    for name, err, tol in cases:
        good = bool(err < tol)
        status = "PASS" if good else "FAIL"
        ok = ok and good
        out[name] = {"front_rel_err": round(float(err), 5), "tol": tol}
        print(f"{status} {name}: front rel err {err:.4f} (tol {tol})",
              flush=True)
    out["all_pass"] = bool(ok)
    print(json.dumps(out), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
