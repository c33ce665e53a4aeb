"""Mid-iteration checkpointing inside the evolve3D convergence loop
(write_iteration_dump / start_from_dump, evolve.F90:199-212, 233-367):
a killed run resumed from the dump must reproduce the uninterrupted
run, restoring the iteration count and rate-grid semantics."""

import os
from dataclasses import replace

import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.state import initial_grid_state
from c2ray_tpu.sweep import SweepConfig, build_shell_table
from c2ray_tpu.sweep.evolve3d import Evolve3DConfig, evolve3d
from c2ray_tpu.sweep.global_pass import ChemistryConfig
import pytest

M = 16


def _setup():
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
    srcpos = jnp.asarray([[8, 8, 8], [4, 11, 6]], dtype=jnp.int32)
    nflux = jnp.asarray([[1.0, 0.0, 0.0], [0.6, 0.0, 0.0]])
    return cfg, state, srcpos, nflux


@pytest.mark.slow
def test_mid_iteration_dump_and_resume(tmp_path):
    cfg, state, srcpos, nflux = _setup()
    dt = 5e13
    dump_dir = str(tmp_path)

    # uninterrupted reference
    ref_state, ref_stats = evolve3d(cfg, state, srcpos, nflux, dt)
    assert ref_stats.n_iterations >= 2

    # the same run dumping every iteration (15-min cadence forced to 0)
    s2, st2 = evolve3d(cfg, state, srcpos, nflux, dt,
                       dump_dir=dump_dir, dump_interval_s=0.0)
    np.testing.assert_allclose(np.asarray(s2.h1), np.asarray(ref_state.h1),
                               rtol=1e-12)
    assert st2.n_iterations == ref_stats.n_iterations
    assert os.path.exists(os.path.join(dump_dir, "iterdump1.npz")) or \
        os.path.exists(os.path.join(dump_dir, "iterdump2.npz"))

    # "kill" after the second-to-last iteration: drop the newest dump
    # so the resume re-enters mid-timestep one iteration back and must
    # re-run the tail of the convergence loop
    slots = [os.path.join(dump_dir, f"iterdump{s}.npz") for s in (1, 2)]
    slots = [p for p in slots if os.path.exists(p)]
    if len(slots) == 2:
        os.remove(max(slots, key=os.path.getmtime))

    s3, st3 = evolve3d(cfg, state, srcpos, nflux, dt,
                       dump_dir=dump_dir, start_from_dump=True)
    # the resume chemistry pass compiles standalone (different XLA
    # fusion than the fused iteration): agreement is ULP-level
    np.testing.assert_allclose(np.asarray(s3.h1), np.asarray(ref_state.h1),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s3.h_av1),
                               np.asarray(ref_state.h_av1), rtol=1e-9)
    # the iteration count continues from the dump (niter restored)
    assert st3.n_iterations == ref_stats.n_iterations


def test_resume_from_final_dump_is_noop_tail(tmp_path):
    """Resuming from the final iteration's dump converges immediately
    to the same state (the dumped rates + one chemistry pass fully
    reconstruct the post-iteration state)."""
    cfg, state, srcpos, nflux = _setup()
    dt = 5e13
    dump_dir = str(tmp_path / "d2")

    ref_state, ref_stats = evolve3d(cfg, state, srcpos, nflux, dt,
                                    dump_dir=dump_dir,
                                    dump_interval_s=0.0)
    s3, st3 = evolve3d(cfg, state, srcpos, nflux, dt,
                       dump_dir=dump_dir, start_from_dump=True)
    np.testing.assert_allclose(np.asarray(s3.h1),
                               np.asarray(ref_state.h1), rtol=1e-9)
    assert st3.n_iterations == ref_stats.n_iterations
