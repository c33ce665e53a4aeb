"""3D wavefront-sweep tests: Stroemgren sphere + geometry invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.onedim import OneDProblem, analytic_front
from c2ray_tpu.photonstats import photon_budget, species_inventory
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.rates import rate_coefficients
from c2ray_tpu.state import initial_grid_state
from c2ray_tpu.sweep import (Evolve3DConfig, SweepConfig, build_shell_table,
                             evolve3d)
from c2ray_tpu.sweep.geometry import ShellTable
from c2ray_tpu.sweep.global_pass import ChemistryConfig


def _setup(M=20, ndens=1.0e-3, S_star=1.0e49, isothermal=True):
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=S_star)),
        isothermal=isothermal, dtype=jnp.float64)
    box = 14.0 * const.kpc
    dr = box / M
    sweep_cfg = SweepConfig(tables=tables, mesh=M, dr=dr,
                            isothermal=isothermal,
                            flux_scale=bands.flux_scale)
    chem_cfg = ChemistryConfig(cooling=None, isothermal=isothermal,
                               isothermal_temperature=1.0e4)
    shells = build_shell_table(M)
    cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem_cfg, shells=shells)
    state = initial_grid_state(np.full((M, M, M), ndens), 0.0, 0.0, 0.0,
                               1.0e4)
    return cfg, state, sed, dr


def test_shell_table_covers_grid_once():
    st = build_shell_table(16)
    assert st.n_cells == 16**3 - 1
    offs = st.offsets[st.mask]
    flat = [tuple(o) for o in offs]
    assert len(set(flat)) == len(flat)
    # causality: shell s only contains |di|+|dj|+|dk| == s+1
    s = np.abs(st.offsets).sum(axis=2)
    for i in range(st.n_shells):
        assert np.all(s[i][st.mask[i]] == i + 1)


@pytest.mark.slow
def test_stromgren_sphere_matches_analytic():
    cfg, state, sed, dr = _setup()
    M = cfg.sweep.mesh
    srcpos = jnp.array([[M // 2] * 3], dtype=jnp.int32)
    nflux = jnp.array([[1.0, 0.0, 0.0]])
    problem = OneDProblem(testnum=1, dens_val=1.0e-3, temper_val=1e4,
                          isothermal=True)
    dt = 10.0e6 * const.YEAR
    t = 0.0
    for _ in range(4):
        state, stats = evolve3d(cfg, state, srcpos, nflux, dt)
        t += dt
    Vion = float(jnp.sum(state.h1)) * dr**3
    r_num = (3.0 * Vion / (4.0 * const.pi)) ** (1.0 / 3.0)
    r_ana = analytic_front(problem, sed.bb.S_star, t)
    assert abs(r_num - r_ana) / r_ana < 0.05
    # interior fully ionized, corners neutral
    h1 = np.asarray(state.h1).reshape(M, M, M)
    assert h1[M // 2, M // 2, M // 2] > 0.999
    assert h1[0, 0, 0] < 0.05


@pytest.mark.slow
def test_photon_conservation_audit():
    cfg, state, sed, dr = _setup()
    M = cfg.sweep.mesh
    srcpos = jnp.array([[M // 2] * 3], dtype=jnp.int32)
    nflux = jnp.array([[1.0, 0.0, 0.0]])
    dt = 10.0e6 * const.YEAR
    vol = dr**3
    before = species_inventory(state, vol)
    state, stats = evolve3d(cfg, state, srcpos, nflux, dt)
    rates = rate_coefficients(jnp.float64(1.0e4))
    budget = photon_budget(before, state, rates, vol, dt,
                           sed.bb.S_star * dt)
    # ionizations+recombination-corrections should balance emitted photons
    # to within the few-percent accuracy of the scheme
    assert 0.7 < float(budget.photon_conservation) < 1.1
    assert float(budget.total_ion) > 0


def test_multi_source_symmetry():
    """Two equal sources placed symmetrically produce a mirror-symmetric
    ionization field."""
    cfg, state, sed, dr = _setup(M=16, S_star=3.0e48)
    M = 16
    srcpos = jnp.array([[4, 8, 8], [12, 8, 8]], dtype=jnp.int32)
    nflux = jnp.array([[0.5, 0.0, 0.0], [0.5, 0.0, 0.0]])
    dt = 10.0e6 * const.YEAR
    state, _ = evolve3d(cfg, state, srcpos, nflux, dt)
    h1 = np.asarray(state.h1).reshape(M, M, M)
    # mirror about the x = 8 plane maps source 1 onto source 2:
    # with periodic wrap, x -> (16 - x) mod 16
    mirrored = h1[(16 - np.arange(16)) % 16][:, :, :]
    np.testing.assert_allclose(h1, mirrored, rtol=1e-6, atol=1e-12)
