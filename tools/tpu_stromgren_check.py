"""On-chip f32 end-to-end physics check: 3D Stromgren sphere vs analytic.

Runs the full evolve3d driver loop (pyramid sweep + chemistry, f32 on
TPU; f64 on CPU) for a single source in a uniform medium and compares
the ionized volume against the analytic Stromgren solution
r(t) = r_S (1 - e^{-t/t_rec})^{1/3} (files_for_1D/output.f90:337-343).

Usage: python tools/tpu_stromgren_check.py [mesh]
Prints one line per step and a final PASS/FAIL (5% front tolerance).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(mesh=64):
    import jax
    import jax.numpy as jnp

    from c2ray_tpu import constants as const
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.rates import rate_coefficients
    from c2ray_tpu.state import initial_grid_state
    from c2ray_tpu.sweep import SweepConfig, build_shell_table
    from c2ray_tpu.sweep.evolve3d import Evolve3DConfig, evolve3d
    from c2ray_tpu.sweep.global_pass import ChemistryConfig

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32 if on_tpu else jnp.float64

    ndens_val = 1.0e-3
    S_star = 5.0e48
    T = 1.0e4
    box = 16.0 * const.kpc

    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=1e5, S_star=S_star)),
        isothermal=True, dtype=dtype)
    sweep_cfg = SweepConfig(tables=tables, mesh=mesh, dr=box / mesh,
                            isothermal=True, flux_scale=bands.flux_scale)
    chem = ChemistryConfig(cooling=None, isothermal=True,
                           isothermal_temperature=T)
    cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem,
                         shells=build_shell_table(mesh))

    state = initial_grid_state(np.full((mesh,) * 3, ndens_val),
                               0.0, 0.0, 0.0, T, dtype=dtype)
    src = jnp.asarray([[mesh // 2] * 3], dtype=jnp.int32)
    nflux = jnp.asarray([[1.0, 0.0, 0.0]], dtype=dtype)

    # analytic Stromgren radius (case-B alpha at T)
    alpha = float(rate_coefficients(jnp.float64(T)).brech0)
    nH = ndens_val * (1.0 - const.abu_he)
    r_S = (3.0 * S_star / (4.0 * np.pi * alpha * nH * nH)) ** (1.0 / 3.0)
    t_rec = 1.0 / (alpha * nH)

    dt = t_rec / 8.0
    vol_cell = (box / mesh) ** 3
    ok = True
    t = 0.0
    for step in range(12):
        state, stats = evolve3d(cfg, state, src, nflux,
                                jnp.asarray(dt, dtype=dtype))
        t += dt
        x = np.asarray(state.h1, np.float64)
        r_num = (np.sum(x) * vol_cell * 3.0 / (4.0 * np.pi)) ** (1.0 / 3.0)
        r_ana = r_S * (1.0 - np.exp(-t / t_rec)) ** (1.0 / 3.0)
        err = abs(r_num - r_ana) / r_ana
        print(f"step {step+1:2d} t/t_rec={t/t_rec:.2f} "
              f"r_num={r_num/const.kpc:.3f} kpc r_ana={r_ana/const.kpc:.3f}"
              f" kpc err={err:.3%} iters={stats.n_iterations}"
              f" subbox={stats.subbox_radius}")
        if step >= 3 and err > 0.05:
            ok = False
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 64))
