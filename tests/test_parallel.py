"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

The TPU analog of the reference's fake-MPI backend testing
(no_mpi.F90): the full sharded path runs on host devices, asserting
bitwise-level agreement with the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from c2ray_tpu import constants as const
from c2ray_tpu.parallel import (ParallelConfig, make_parallel_iteration,
                                pad_sources, parallel_evolve3d)
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.state import begin_timestep, initial_grid_state
from c2ray_tpu.sweep import SweepConfig, build_shell_table
from c2ray_tpu.sweep.evolve3d import (Evolve3DConfig, evolve3d,
                                      make_evolve3d_iteration)
from c2ray_tpu.sweep.global_pass import ChemistryConfig


def _setup(M=16):
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=1.0e49)),
        isothermal=True, dtype=jnp.float64)
    dr = 14.0 * const.kpc / M
    cfg = Evolve3DConfig(
        sweep=SweepConfig(tables=tables, mesh=M, dr=dr, isothermal=True,
                          flux_scale=bands.flux_scale),
        chem=ChemistryConfig(cooling=None, isothermal=True,
                             isothermal_temperature=1.0e4),
        shells=build_shell_table(M),
    )
    state = initial_grid_state(np.full((M, M, M), 1.0e-3), 0.0, 0.0, 0.0,
                               1.0e4)
    return cfg, state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_iteration_matches_single_device():
    cfg, state = _setup()
    M = cfg.sweep.mesh
    rng = np.random.RandomState(3)
    srcpos = rng.randint(0, M, (5, 3)).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, 5),
                             np.zeros((5, 2))])
    dt = jnp.float64(5e13)

    state0 = begin_timestep(state)

    # single-device
    it1 = make_evolve3d_iteration(cfg)
    s1, conv1, pl1, _ = it1(state0, jnp.asarray(srcpos), jnp.asarray(nflux),
                            dt)

    # 8-device sharded
    mesh_dev = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)
    it8 = make_parallel_iteration(pcfg)
    sp, nf = pad_sources(srcpos, nflux, 8)
    s8, conv8, pl8, _ = it8(state0, jnp.asarray(sp), jnp.asarray(nf), dt)

    # the psum reduction order differs from the sequential accumulation,
    # and the chemistry fixed point (1e-2 exit tolerance) amplifies the
    # reordering noise slightly -- agreement to ~1e-5 is the expected
    # envelope, not bitwise equality
    np.testing.assert_allclose(np.asarray(s8.h_av1), np.asarray(s1.h_av1),
                               rtol=1e-5, atol=1e-14)
    np.testing.assert_allclose(np.asarray(s8.h_int1),
                               np.asarray(s1.h_int1), rtol=1e-5, atol=1e-14)
    assert int(conv8) == int(conv1)
    np.testing.assert_allclose(float(pl8), float(pl1), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_parallel_evolve3d_runs():
    cfg, state = _setup()
    M = cfg.sweep.mesh
    mesh_dev = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)
    srcpos = np.array([[M // 2] * 3], dtype=np.int32)
    nflux = np.array([[1.0, 0.0, 0.0]])
    state, stats = parallel_evolve3d(pcfg, state, srcpos, nflux,
                                     10e6 * const.YEAR)
    assert stats.n_iterations >= 2
    assert float(jnp.max(state.h1)) > 0.99
