"""Unit tests: thermal solver vs scipy ODE, cosmology clock identities."""

import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from c2ray_tpu import constants as const
from c2ray_tpu.chemistry import IonState, ion_fractions, electrondens
from c2ray_tpu.cooling import coolin, setup_cooling_tables
from c2ray_tpu.cosmology import (COSMOLOGIES, CosmoClock, DEFAULT_COSMOLOGY,
                                 cosmo_evol_scaling)
from c2ray_tpu.thermal import pressr2temper, temper2pressr, thermal


def _ion(h1, he1, he2):
    f = ion_fractions(jnp.float64(h1), jnp.float64(he1), jnp.float64(he2))
    return IonState(cur=f, avg=f, old=f)


def test_thermal_vs_scipy_ode():
    """The sub-cycled energy integration must track a reference ODE
    solution of du/dt = heating - cooling(T(u)) (thermal.f90:98-157)."""
    tables = setup_cooling_tables()
    ndens = 1.0e-3
    ion = _ion(0.999, 0.1, 0.88)
    ne = float(electrondens(ndens, ion.avg))
    heating = 5.0e-25
    T0 = 8000.0
    dt = 1.0e13

    res = thermal(dt, jnp.float64(T0), jnp.float64(ne), jnp.float64(ndens),
                  ion, jnp.float64(heating), tables)

    def du_dt(t, u):
        T = pressr2temper(u[0] * const.gamma1, ndens, ne)
        cool = float(coolin(tables, ndens, ne, ion.avg.h0, ion.avg.h1,
                            ion.avg.he0, ion.avg.he1, ion.avg.he2,
                            jnp.float64(T)))
        return [heating - cool]

    u0 = temper2pressr(T0, ndens, ne) / const.gamma1
    sol = solve_ivp(du_dt, [0, dt], [u0], rtol=1e-10, atol=1e-30)
    T_ref = pressr2temper(sol.y[0, -1] * const.gamma1, ndens, ne)
    # relative_denergy=0.1 caps per-substep change; expect few-% accuracy
    np.testing.assert_allclose(float(res.end_temper), T_ref, rtol=0.05)
    # average temperature lies between initial and final
    lo, hi = sorted((T0, float(res.end_temper)))
    assert lo <= float(res.avg_temper) <= hi


def test_thermal_cooling_equilibrium():
    """With heating exactly balancing cooling the temperature is static."""
    tables = setup_cooling_tables()
    ndens = 1.0e-3
    ion = _ion(0.999, 0.1, 0.88)
    ne = float(electrondens(ndens, ion.avg))
    T0 = 2.0e4
    cool0 = float(coolin(tables, ndens, ne, ion.avg.h0, ion.avg.h1,
                         ion.avg.he0, ion.avg.he1, ion.avg.he2,
                         jnp.float64(T0)))
    res = thermal(1.0e14, jnp.float64(T0), jnp.float64(ne),
                  jnp.float64(ndens), ion, jnp.float64(cool0), tables)
    np.testing.assert_allclose(float(res.end_temper), T0, rtol=0.02)


def test_thermal_minitemp_floor():
    tables = setup_cooling_tables()
    ndens = 1.0
    ion = _ion(0.9, 0.05, 0.05)
    ne = float(electrondens(ndens, ion.avg))
    res = thermal(1.0e18, jnp.float64(5000.0), jnp.float64(ne),
                  jnp.float64(ndens), ion, jnp.float64(0.0), tables)
    # pure cooling bottoms out at the minitemp floor (thermal.f90:140-146);
    # the final temperature is recomputed with the end-of-step electron
    # density (thermal.f90:167), so it can sit marginally below the floor
    assert float(res.end_temper) >= 0.95
    assert float(res.end_temper) < 5000.0


def test_cosmo_clock_roundtrip():
    clock = CosmoClock.init(DEFAULT_COSMOLOGY, 9.0)
    for z in (8.5, 7.0, 6.0):
        t = clock.zred2time(z)
        np.testing.assert_allclose(float(clock.time2zred(t)), z, rtol=1e-12)
    # time zero is the initial redshift
    np.testing.assert_allclose(float(clock.time2zred(0.0)), 9.0, rtol=1e-12)


def test_cosmo_evolution_scalings():
    clock = CosmoClock.init(DEFAULT_COSMOLOGY, 9.0)
    clock, zf0, _ = clock.redshift_evol(0.0)
    # first rescale converts comoving -> proper: zfactor = (1+0)/(1+9)
    np.testing.assert_allclose(zf0, 0.1, rtol=1e-12)
    t1 = clock.zred2time(8.0)
    clock, zf, Hz = clock.redshift_evol(t1)
    np.testing.assert_allclose(zf, 10.0 / 9.0, rtol=1e-10)
    lf, vf, df = cosmo_evol_scaling(zf)
    np.testing.assert_allclose(vf, zf**3, rtol=1e-12)
    np.testing.assert_allclose(df, zf**-3, rtol=1e-12)
    assert Hz > 0


def test_cosmology_variants_present():
    # the seven reference parameter sets (cosmoparms*.f90)
    for name in ("WMAP3plus", "WMAP1", "WMAP3", "WMAP5", "EoRKP", "TEST4"):
        p = COSMOLOGIES[name]
        assert 0.2 < p.Omega0 < 0.4
        assert p.H0 > 0


def test_compton_cooling_sign():
    clock = CosmoClock.init(DEFAULT_COSMOLOGY, 9.0)
    clock, _, _ = clock.redshift_evol(clock.zred2time(8.0))
    # hot gas loses energy to the CMB; gas colder than T_CMB gains
    assert float(clock.compton_cool_rate(1.0e4, 1.0e-3)) > 0
    assert float(clock.compton_cool_rate(1.0, 1.0e-3)) < 0


def test_reference_ascii_cooling_tables_roundtrip(tmp_path):
    """The ASCII loader reads reference-format tables; our regenerated
    fit-based curves agree with a table written in that format."""
    import os

    from c2ray_tpu.cooling import (MINTEMP_LOG, DTEMP_LOG, TEMPPOINTS,
                                   load_ascii_cooling_table,
                                   setup_cooling_tables,
                                   setup_cooling_tables_from_files)

    tabs = setup_cooling_tables()
    logt = MINTEMP_LOG + DTEMP_LOG * np.arange(TEMPPOINTS)
    names = ("H0-cool.tab", "H1-cool-B.tab", "He0-cool_new.tab",
             "He1-cool_new_nocollion.tab", "He2-cool.tab")
    for name, col in zip(names, tabs):
        vals = np.log10(np.maximum(np.asarray(col), 1e-50))
        with open(tmp_path / name, "w") as f:
            f.write("1 1 0\n")
            for lt, lv in zip(logt, vals):
                f.write(f"{lt:.6f}  {lv:.6f}\n")
    loaded = setup_cooling_tables_from_files(str(tmp_path))
    for a, b in zip(loaded, tabs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5)

    # and, when the reference checkout is present, its own tables load
    ref_dir = "/root/reference/tables"
    if os.path.isdir(ref_dir):
        ref = setup_cooling_tables_from_files(ref_dir)
        # same T range; physically comparable magnitudes where active
        a = np.asarray(ref.h0)
        b = np.asarray(tabs.h0)
        m = (logt > 4.2) & (logt < 5.0)   # collisional-excitation peak
        assert np.all(np.abs(np.log10(a[m]) - np.log10(b[m])) < 0.5)


def test_run3d_adiabatic_cosmological_cooling(tmp_path):
    """A zero-flux non-isothermal cosmological run must cool
    adiabatically: per step the reference applies a fixed cooling rate
    factor*u0 with factor = 2(dz/dt)/(1+z) evaluated at the step's
    redshift (thermal.f90:76-107, cosmology.f90:207-234), so
    T_{k+1} = T_k (1 - factor_k dt) exactly."""
    from c2ray_tpu.driver import Run3D, Run3DConfig, set_timesteps
    from c2ray_tpu.nbody import test_nbody as make_test_nbody
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.sources import SourceList

    nb = make_test_nbody()
    cfg = Run3DConfig(mesh=8, nbody=nb,
                      sed=SEDConfig(bb=BlackBodySED(T_eff=5e4,
                                                    S_star=1e48)),
                      isothermal=False, initial_temperature=1.0e4,
                      steps_per_slice=2, cosmological=True,
                      results_dir=str(tmp_path), dump_dir=str(tmp_path))
    run = Run3D(cfg)
    run.init_uniform_material()
    # one zero-flux source: the sweep treats it as a no-op, so the grid
    # sees no photons and only cosmological cooling acts
    src = SourceList(srcpos=np.array([[4, 4, 4]], dtype=np.int32),
                     nflux=np.array([[0.0, 0.0, 0.0]]))
    run.run_slice(0, src, write_output=False)

    # replay the clock to predict T(z)
    z0 = float(nb.zred_array[0])
    clock = CosmoClock.init(nb.cosmology, z0)
    clock, _, _ = clock.redshift_evol(0.0)
    t1, t2, dt = set_timesteps(clock, z0, float(nb.zred_array[1]), 2)
    T = 1.0e4
    for step in range(2):
        clock, _, _ = clock.redshift_evol(t1 + (step + 0.5) * dt)
        T *= 1.0 - clock.cosmo_cool_factor() * dt
    t_grid = np.asarray(run.state.t_final)
    assert T < 0.995e4  # the factor actually cooled something
    np.testing.assert_allclose(t_grid, T, rtol=2e-3)


def test_coolin_matmul_matches_gather():
    """The TPU two-hot MXU interpolation path of coolin() must agree
    with the gather path to rounding (same interpolation weights; see
    the round-3 XLA:TPU gather-fault note in cooling.py)."""
    import jax.numpy as jnp
    import numpy as np
    from c2ray_tpu.cooling import coolin, setup_cooling_tables

    tables = setup_cooling_tables(dtype=jnp.float64)
    rng = np.random.RandomState(3)
    n = 4096
    T = 10 ** rng.uniform(0.0, 9.5, n)      # incl. off-table ends
    x = rng.uniform(0, 1, n)
    args = (jnp.full((n,), 1e-4), jnp.asarray(x * 1e-4),
            jnp.asarray(1 - x), jnp.asarray(x), jnp.asarray(1 - x),
            jnp.asarray(x * 0.9), jnp.asarray(x * 0.1),
            jnp.asarray(T))
    a = coolin(tables, *args, use_matmul=False)
    b = coolin(tables, *args, use_matmul=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-12, atol=0)
