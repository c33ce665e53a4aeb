"""End-to-end 1D analytic test problems (the reference's primary
correctness oracle, SURVEY.md section 4).

Test 1 (Stroemgren) is exercised at higher resolution in the verify
drive; here all four problems run at modest resolution within CI time.
"""

import numpy as np
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.grid import RadialGrid
from c2ray_tpu.onedim import (OneDProblem, analytic_front, numerical_front)
from c2ray_tpu.onedim.driver import OneDRun
from c2ray_tpu.radiation import BlackBodySED, SEDConfig

kpc = const.kpc


def _run(problem, grid, sed, t_total, nsteps):
    run = OneDRun.setup(problem, grid, sed)
    for _ in range(nsteps):
        run.step(t_total / nsteps)
    return run


def test1_stromgren_front():
    problem = OneDProblem(testnum=1, dens_val=1.0e-3, temper_val=1e4,
                          isothermal=True)
    grid = RadialGrid(r_in=0.0, r_out=10.0 * kpc, mesh=128)
    sed = SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=5.0e48))
    run = _run(problem, grid, sed, 120e6 * const.YEAR, 12)
    nf = numerical_front(grid.x, grid.dr, np.asarray(run.state.xh[:, 1]))
    af = analytic_front(problem, run.sed.bb.S_star, run.time)
    assert abs(nf - af) / af < 0.05


def test2_one_over_r_front():
    """1/r density profile vs the LambertW front solution
    (output.f90:344-347, mat_ini.F90:142-143).

    The front saturates at L/K = S / (4 pi n_c^2 r_c^2 alphaB); the
    parameters put that at ~5 kpc so the approach phase is resolved.
    """
    r_core = 1.0 * kpc
    n_core = 1.0e-3
    S_star = 4.8e47
    problem = OneDProblem(testnum=2, dens_val=n_core, r_core=r_core,
                          temper_val=1e4, isothermal=True)
    grid = RadialGrid(r_in=0.0, r_out=8.0 * kpc, mesh=128)
    sed = SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=S_star))
    t_total = 300e6 * const.YEAR
    run = _run(problem, grid, sed, t_total, 15)
    nf = numerical_front(grid.x, grid.dr, np.asarray(run.state.xh[:, 1]))
    af = analytic_front(problem, run.sed.bb.S_star, run.time)
    assert abs(nf - af) / af < 0.1


def test3_core_profile_front():
    """1/r^2 density with flat core; L ~ 0 parameter choice so the
    analytic r_core sqrt(1+2t/t_rec) branch applies
    (output.f90:348-374)."""
    r_core = 1.0 * kpc
    # choose density so that L ~ 0: S = 4 pi n^2 r^3 alphaB * 4/3
    n_core = 1.2e-3
    S_star = (4.0 * const.pi * n_core**2 * r_core**3 * const.bh00
              * 4.0 / 3.0)
    problem = OneDProblem(testnum=3, dens_val=n_core, r_core=r_core,
                          temper_val=1e4, isothermal=True)
    grid = RadialGrid(r_in=0.0, r_out=6.0 * kpc, mesh=128)
    sed = SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=S_star))
    t_total = 300e6 * const.YEAR
    run = _run(problem, grid, sed, t_total, 15)
    nf = numerical_front(grid.x, grid.dr, np.asarray(run.state.xh[:, 1]))
    af = analytic_front(problem, run.sed.bb.S_star, run.time)
    # the L ~ 0 branch is marginally stable; the discrete front lags a
    # a few tens of percent at this resolution
    assert abs(nf - af) / af < 0.2


def test4_cosmological_front():
    """Shapiro-Giroux expanding-universe I-front vs the
    exponential-integral solution (output.f90:376-385)."""
    problem = OneDProblem(testnum=4, dens_val=1.87e-4 / 1000.0,
                          temper_val=1e4, isothermal=True, zred00=9.0)
    # comoving grid; dens_val is comoving here (mat_ini.F90:247-253)
    grid = RadialGrid(r_in=0.0, r_out=700.0 * kpc, mesh=128)
    sed = SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=3.0e50))
    run = OneDRun.setup(problem, grid, sed)
    t_total = 50.0e6 * const.YEAR
    nsteps = 10
    for _ in range(nsteps):
        run.step(t_total / nsteps)
    nf = numerical_front(run.grid.x, run.grid.dr,
                         np.asarray(run.state.xh[:, 1]))
    af = analytic_front(problem, run.sed.bb.S_star, run.time,
                        zred=float(run.clock.zred),
                        t0=run.clock.t0)
    # front must stay inside the grid (otherwise numerical_front
    # degenerates) and track the expint solution
    assert nf < run.grid.x[-1]
    assert abs(nf - af) / af < 0.15


def test_uvb_equilibrium_initial_fractions():
    """With a UV background the initial fractions solve the equilibrium
    fixed point (find_ionfractions_from_uvb, mat_ini.F90:286-321)."""
    problem = OneDProblem(testnum=1, dens_val=1.0e-4, temper_val=1e4,
                          isothermal=True,
                          gamma_uvb=(1e-12, 1e-13, 1e-15))
    grid = RadialGrid(r_in=0.0, r_out=10.0 * kpc, mesh=8)
    from c2ray_tpu.onedim.material import init_material
    ndens, temper, xh, xhe = init_material(problem, grid)
    # highly ionized H under a strong UVB
    assert np.all(xh[:, 1] > 0.9)
    assert np.all(xhe[:, 1] + xhe[:, 2] > 0.5)
    # fractions sum to 1
    np.testing.assert_allclose(xh.sum(axis=1), 1.0, rtol=1e-10)
    np.testing.assert_allclose(xhe.sum(axis=1), 1.0, rtol=1e-10)
