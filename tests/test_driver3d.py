"""End-to-end 3D driver test: one redshift slice of the synthetic test
backend with output + photon-count streams."""

import numpy as np
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.driver import Run3D, Run3DConfig, set_timesteps
from c2ray_tpu.cosmology import CosmoClock
from c2ray_tpu.io import read_unformatted_cube
from c2ray_tpu.nbody import test_nbody as make_test_nbody
from c2ray_tpu.io.writers import OutputStreams
from c2ray_tpu.radiation.sed import BlackBodySED, SEDConfig
from c2ray_tpu.sources import SourceList


def test_set_timesteps():
    nb = make_test_nbody()
    clock = CosmoClock.init(nb.cosmology, float(nb.zred_array[0]))
    t1, t2, dt = set_timesteps(clock, float(nb.zred_array[0]),
                               float(nb.zred_array[1]), 4)
    # the test backend spaces slices 10 Myr apart (test.F90:90-109)
    np.testing.assert_allclose(t2 - t1, 1e7 * const.YEAR, rtol=1e-6)
    np.testing.assert_allclose(dt, 0.25e7 * const.YEAR, rtol=1e-6)


def test_run3d_slice(tmp_path):
    nb = make_test_nbody()
    config = Run3DConfig(
        mesh=16, nbody=nb,
        sed=SEDConfig(bb=BlackBodySED(T_eff=5.0e4, S_star=3e56)),
        isothermal=True, steps_per_slice=2,
        results_dir=str(tmp_path / "results"),
        dump_dir=str(tmp_path),
        streams=OutputStreams(ion_cubes=True, axis_cut=True),
    )
    run = Run3D(config)
    run.init_uniform_material()

    sources = SourceList(srcpos=np.array([[8, 8, 8]], dtype=np.int32),
                         nflux=np.array([[1.0, 0.0, 0.0]]))
    stats = run.run_slice(0, sources)
    assert len(stats) == 2
    assert all(s.n_iterations >= 2 for s in stats)

    # ionization grew around the source.  Note: at 16^3 in a 10 Mpc/h
    # box each cell is extremely thick (tau ~ 3400), so the front stays
    # within ~a cell per slice -- the same behavior as the reference's
    # time-averaged-column scheme in this regime.
    h1 = np.asarray(run.state.h1).reshape(16, 16, 16)
    assert h1[8, 8, 8] > 0.9
    assert h1.mean() > 1e-4

    # output cube written and readable, with the driven value inside
    from c2ray_tpu.io.writers import _zred_str
    z2 = float(nb.zred_array[1])
    cube = read_unformatted_cube(
        str(tmp_path / "results" / f"xfrac3d_{_zred_str(z2)}.bin"),
        dtype=np.float64)
    np.testing.assert_allclose(cube, h1, rtol=1e-12)

    # photon statistics stream exists with one line per step
    counts = (tmp_path / "results" / "PhotonCounts.out").read_text()
    assert len(counts.strip().splitlines()) == 2
    # axis-cut stream exists
    assert (tmp_path / "results"
            / f"Ifront1_{_zred_str(z2)}.dat").exists()

    # cosmological rescaling advanced the clock past the slice
    assert run.clock.zred < float(nb.zred_array[0])


def test_restart_from_slice(tmp_path):
    """Slice restart reads the output cubes back (mat_ini_test.F90:269-465)."""
    nb = make_test_nbody()
    config = Run3DConfig(
        mesh=8, nbody=nb,
        sed=SEDConfig(bb=BlackBodySED(T_eff=5.0e4, S_star=3e55)),
        isothermal=True, steps_per_slice=1,
        results_dir=str(tmp_path / "results"), dump_dir=str(tmp_path))
    run = Run3D(config)
    run.init_uniform_material()
    src = SourceList(srcpos=np.array([[4, 4, 4]], dtype=np.int32),
                     nflux=np.array([[1.0, 0.0, 0.0]]))
    run.run_slice(0, src)
    h1_end = np.asarray(run.state.h1).copy()

    # new driver instance restarts from the written cubes
    run2 = Run3D(config)
    run2.init_uniform_material(float(nb.zred_array[1]))
    run2.restart_from_slice(float(nb.zred_array[1]))
    np.testing.assert_allclose(np.asarray(run2.state.h1), h1_end,
                               rtol=1e-12, atol=1e-15)


def test_config_from_dict(tmp_path):
    """One JSON blob configures a full 3D run (the stdin-deck analog)."""
    from c2ray_tpu.config import run3d_config_from_dict

    cfg = run3d_config_from_dict({
        "mesh": 8,
        "nbody": {"type": "test"},
        "sed": {"bb": {"T_eff": 5.0e4, "S_star": 1e55}},
        "isothermal": True,
        "steps_per_slice": 1,
        "clumping": {"type_of_clumping": 1, "clumping_factor": 2.0},
        "results_dir": str(tmp_path / "r"),
        "dump_dir": str(tmp_path),
    })
    assert cfg.mesh == 8
    assert cfg.clumping.clumping_factor == 2.0
    run = Run3D(cfg)
    run.init_uniform_material()
    src = SourceList(srcpos=np.array([[4, 4, 4]], dtype=np.int32),
                     nflux=np.array([[1.0, 0.0, 0.0]]))
    stats = run.run_slice(0, src, write_output=False)
    assert stats[0].n_iterations >= 2


def test_cosmological_density_stays_proper():
    """cosmology_init converts comoving->proper ONCE at t=0
    (cosmology.f90:64-71); the per-step rescale must then be purely
    incremental. A missing init conversion double-counts (1+z)^3 and
    inflates the density ~1000x at z~9."""
    from c2ray_tpu.driver import Run3D, Run3DConfig, set_timesteps
    from c2ray_tpu.material import mean_baryon_density
    from c2ray_tpu.nbody import test_nbody as make_test_nbody
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig

    nb = make_test_nbody()
    cfg = Run3DConfig(mesh=8, nbody=nb,
                      sed=SEDConfig(bb=BlackBodySED(T_eff=5e4,
                                                    S_star=1e48)),
                      isothermal=True)
    run = Run3D(cfg)
    run.init_uniform_material()
    z0 = float(nb.zred_array[0])
    np.testing.assert_allclose(float(run.state.ndens[0]),
                               mean_baryon_density(z0, nb.cosmology),
                               rtol=1e-6)
    t1, t2, dt = set_timesteps(run.clock, z0, float(nb.zred_array[1]),
                               cfg.steps_per_slice)
    run._cosmo_evolve_to(t1 + 0.5 * dt)
    z_mid = run.clock.zred
    assert z_mid < z0
    np.testing.assert_allclose(float(run.state.ndens[0]),
                               mean_baryon_density(z_mid, nb.cosmology),
                               rtol=1e-3)
    # and dr is proper: comoving cell / (1+z).  The live value is
    # run.dr_proper (a traced input of the jitted iteration, so config
    # rebuild/recompile per step is unnecessary).
    expected_dr = run.grid.dr / (1.0 + z_mid)
    np.testing.assert_allclose(run.dr_proper, expected_dr, rtol=1e-3)
