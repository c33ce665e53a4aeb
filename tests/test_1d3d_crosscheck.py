"""1D <-> 3D cross-check (the reference's `test_against3D` idea,
files_for_1D/inputs/test_against3D~; the 1D code mirrors 3D naming
precisely to allow profile-vs-profile comparison,
files_for_1D/grid.F90:16-20): the same physical problem -- uniform
density, one blackbody source, isothermal -- run through the
spherically-symmetric 1D solver and through the 3D sweep must produce
the same ionization front."""

import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.grid import RadialGrid
from c2ray_tpu.onedim import OneDProblem, numerical_front
from c2ray_tpu.onedim.driver import OneDRun
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.state import initial_grid_state
from c2ray_tpu.sweep import SweepConfig, build_shell_table
from c2ray_tpu.sweep.evolve3d import Evolve3DConfig, evolve3d
from c2ray_tpu.sweep.global_pass import ChemistryConfig
import pytest


@pytest.mark.slow
def test_1d_3d_front_agreement():
    M = 24
    dens = 1.0e-3
    S_star = 2.0e48
    sed = SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=S_star))
    dr = 1.0 * const.kpc          # same cell size in both codes
    n_steps, dt = 6, 1.0e7 * const.YEAR

    # --- 1D radial solve
    problem = OneDProblem(testnum=1, dens_val=dens, temper_val=1e4,
                          isothermal=True)
    rgrid = RadialGrid(r_in=0.0, r_out=M * dr, mesh=4 * M)
    run1d = OneDRun.setup(problem, rgrid, sed)
    for _ in range(n_steps):
        run1d.step(dt)
    r_front_1d = numerical_front(rgrid.x, rgrid.dr,
                                 np.asarray(run1d.state.xh[:, 1]))

    # --- 3D single source at the center
    tables, _, bands = build_quadrature_tables(sed, isothermal=True,
                                               dtype=jnp.float64)
    cfg = Evolve3DConfig(
        sweep=SweepConfig(tables=tables, mesh=M, dr=dr, isothermal=True,
                          flux_scale=bands.flux_scale),
        chem=ChemistryConfig(cooling=None, isothermal=True,
                             isothermal_temperature=1.0e4),
        shells=build_shell_table(M))
    state = initial_grid_state(np.full((M,) * 3, dens), 0.0, 0.0, 0.0,
                               1.0e4)
    srcpos = jnp.asarray([[M // 2, M // 2, M // 2]], dtype=jnp.int32)
    nflux = jnp.asarray([[1.0, 0.0, 0.0]])
    cache = {}
    for _ in range(n_steps):
        state, _ = evolve3d(cfg, state, srcpos, nflux, dt,
                            iteration_cache=cache)

    h1 = np.asarray(state.h1).reshape(M, M, M)
    # front radius from the ionized volume (direction-averaged)
    r_front_3d = (3.0 * h1.sum() * dr**3 / (4.0 * np.pi)) ** (1.0 / 3.0)

    # the 1D front must match the 3D front within a cell
    assert abs(r_front_3d - r_front_1d) < 1.0 * dr, (
        r_front_1d / const.kpc, r_front_3d / const.kpc)

    # and the on-axis 3D profile must match the 1D profile shape:
    # compare the ionized fraction at a few radii
    prof_3d = h1[M // 2, M // 2, M // 2:]
    x1 = np.asarray(run1d.state.xh[:, 1])
    for k in (2, 4, 6):
        r = k * dr
        i1 = int(np.argmin(np.abs(np.asarray(rgrid.x) - r)))
        assert abs(prof_3d[k] - x1[i1]) < 0.15, (k, prof_3d[k], x1[i1])
