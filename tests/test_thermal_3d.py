"""Non-isothermal 3D: photo-heating through the quadrature heat path."""

import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.cooling import setup_cooling_tables
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.state import initial_grid_state
from c2ray_tpu.sweep import (Evolve3DConfig, SweepConfig, build_shell_table,
                             evolve3d)
from c2ray_tpu.sweep.global_pass import ChemistryConfig


def test_3d_photoheating():
    M = 16
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=1.0e49)),
        isothermal=False, dtype=jnp.float64)
    dr = 12.0 * const.kpc / M
    cfg = Evolve3DConfig(
        sweep=SweepConfig(tables=tables, mesh=M, dr=dr, isothermal=False,
                          flux_scale=bands.flux_scale),
        chem=ChemistryConfig(cooling=setup_cooling_tables(),
                             isothermal=False),
        shells=build_shell_table(M),
    )
    T0 = 100.0
    state = initial_grid_state(np.full((M, M, M), 1.0e-3), 0.0, 0.0, 0.0,
                               T0)
    srcpos = jnp.array([[M // 2] * 3], dtype=jnp.int32)
    nflux = jnp.array([[1.0, 0.0, 0.0]])
    state, stats = evolve3d(cfg, state, srcpos, nflux, 5.0e6 * const.YEAR)

    T = np.asarray(state.t_final).reshape(M, M, M)
    h1 = np.asarray(state.h1).reshape(M, M, M)
    he2 = np.asarray(state.he2).reshape(M, M, M)
    c = M // 2
    # photo-heated HII region: a 1e5 K blackbody heats gas to ~2-5e4 K
    assert 1.5e4 < T[c, c, c] < 6.0e4
    assert h1[c, c, c] > 0.99
    # hard BB doubly ionizes He near the source
    assert he2[c, c, c] > 0.5
    # beyond the front the gas stays near the initial temperature
    assert T[0, 0, 0] < 5.0 * T0
    assert np.all(np.isfinite(T))


def test_host_loop_chemistry_matches_while_loop():
    """The host-level outer chemistry loop (the XLA:TPU nested-loop
    fault workaround, global_pass._do_chemistry_global host_loop=True)
    must reproduce the in-graph lax.while_loop exactly."""
    import jax.numpy as jnp
    import numpy as np
    from c2ray_tpu.cooling import setup_cooling_tables
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep.global_pass import (ChemistryConfig,
                                             global_chemistry_pass)
    from c2ray_tpu.sweep.source_sweep import RateGrids

    M = 8
    n = M ** 3
    cfg = ChemistryConfig(cooling=setup_cooling_tables(
        dtype=jnp.float64), isothermal=False,
        isothermal_temperature=1.0e4)
    rng = np.random.RandomState(5)
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4))
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-14, -9, n)),
        phihe0=jnp.asarray(10 ** rng.uniform(-15, -10, n)),
        phihe1=jnp.asarray(10 ** rng.uniform(-16, -11, n)),
        phiheat=jnp.asarray(10 ** rng.uniform(-32, -26, n)),
        photon_loss=jnp.zeros(()), lls_loss=jnp.zeros(()))
    dt = 1.0e13

    s_while, c_while = global_chemistry_pass(cfg, state, rates, dt,
                                             host_loop=False)
    s_host, c_host = global_chemistry_pass(cfg, state, rates, dt,
                                           host_loop=True)
    assert int(c_host) == int(c_while)
    for name in ("h_av1", "he_av2", "t_av", "t_inter"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_host, name)),
            np.asarray(getattr(s_while, name)), rtol=1e-10,
            atol=1e-15, err_msg=name)
