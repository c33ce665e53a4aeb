"""Run3D.run(): the full redshift loop from ONE declarative config
(C2Ray.F90:238-380) -- per slice: density file, clumping, halo catalog
with suppression against the current ionization state, timestep loop,
PhotonCounts output.  A TEST4-class cosmological multi-slice run at
test scale."""

import pytest

pytestmark = pytest.mark.slow

import json

import numpy as np
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.config import run3d_config_from_json
from c2ray_tpu.driver import Run3D
from c2ray_tpu.io.fortran_records import write_unformatted_cube
from c2ray_tpu.io.readers import _zred_str

M = 16
NSLICE = 3


def _make_inputs(tmp_path):
    """Synthesize a cubep3m-style input tree: redshift list, per-slice
    density cubes (grid units) and halo catalogs."""
    base = tmp_path / "nbody"
    dens_dir = base / "coarser_densities" / "halos_removed"
    src_dir = base / "sources"
    dens_dir.mkdir(parents=True)
    src_dir.mkdir(parents=True)

    # EdS-ish descending redshift list
    zreds = [9.0, 8.9, 8.8, 8.7][:NSLICE + 1]
    zfile = base / "redshifts.txt"
    zfile.write_text(f"{len(zreds)}\n" +
                     "\n".join(f"{z:.3f}" for z in zreds))

    rng = np.random.RandomState(11)
    n_box = M  # fine grid == RT grid for the test tree
    for z in zreds:
        # overdense blob around the halo so the test is inhomogeneous
        cube = 1.0 + 0.2 * rng.rand(M, M, M).astype(np.float32)
        cube[6:10, 6:10, 6:10] += 2.0
        write_unformatted_cube(
            str(dens_dir / f"{_zred_str(z)}n_all.dat"), cube,
            dtype=np.float32)
        # halo catalog: (i,j,k, mass_hmach, mass_lmach), 1-based
        lines = ["2",
                 "9 9 9 2000.0 0.0",      # massive halo, always on
                 "4 12 6 0.0 500.0"]      # low-mass, suppressible
        (src_dir / f"{_zred_str(z)}_wsubgrid_sources.dat").write_text(
            "\n".join(lines) + "\n")
    return str(zfile), str(base) + "/"


def test_full_config_driven_run(tmp_path):
    zfile, base = _make_inputs(tmp_path)
    cfg_json = {
        "mesh": M,
        "cosmology": "WMAP3plus",
        "nbody": {"type": "cubep3m", "redshift_file": zfile,
                  "boxsize": 0.7, "n_box": M, "base_dir": base,
                  "source_dir": base + "sources/"},
        "sed": {"bb": {"T_eff": 5.0e4, "S_star": 1.0e48}},
        "isothermal": True,
        "steps_per_slice": 2,
        "density_input": "files",
        "source_input": "catalog",
        "halo_model": {"uv_model": "Iliev et al",
                       "phot_per_atom": [250.0, 250.0],
                       "lifetime": 1.0e13},
        "clumping": {"type_of_clumping": 1, "clumping_factor": 1.0},
        "results_dir": str(tmp_path / "results"),
        "dump_dir": str(tmp_path),
        "streams": {"ion_cubes": True},
    }
    cfg_path = tmp_path / "run.json"
    cfg_path.write_text(json.dumps(cfg_json))

    config = run3d_config_from_json(str(cfg_path))
    run = Run3D(config)
    all_stats = run.run(num_slices=NSLICE)

    assert len(all_stats) == NSLICE
    # every slice ran its steps and converged
    for sl in all_stats:
        assert len(sl) == 2
        assert all(s.n_iterations >= 2 for s in sl)

    # the halo sources ionized around (8,8,8) [0-based]
    h1 = np.asarray(run.state.h1).reshape(M, M, M)
    assert h1[8, 8, 8] > 0.5
    assert h1.mean() > h1[0, 0, 0]

    # density came from the files (inhomogeneous, scaled to proper)
    nd = np.asarray(run.state.ndens).reshape(M, M, M)
    assert nd.std() / nd.mean() > 0.05

    # suppression ran against the current xh: initially neutral, the
    # low-mass halo is active on slice 0
    assert run.last_suppression is not None
    assert run.last_suppression.n_total == 2

    # PhotonCounts written: one line per step per slice
    counts = (tmp_path / "results" / "PhotonCounts.out").read_text()
    assert len(counts.strip().splitlines()) == NSLICE * 2
    counts2 = (tmp_path / "results" / "PhotonCounts2.out").read_text()
    assert len(counts2.strip().splitlines()) == NSLICE

    # ionization cube written for every slice boundary
    for z in config.nbody.zred_array[1:NSLICE + 1]:
        p = tmp_path / "results" / f"xfrac3d_{_zred_str(float(z))}.bin"
        assert p.exists(), p

    # cosmological clock advanced through all slices (the rescale
    # happens at mid-step, C2Ray.F90:322-325, so it lags half a step)
    np.testing.assert_allclose(
        run.clock.zred, float(config.nbody.zred_array[NSLICE]), atol=0.05)


def test_suppression_reacts_to_ionization(tmp_path):
    """Low-mass halos must stop shining once their cell ionizes
    (sourceprops_cubep3m.F90:291-305): order matters across slices."""
    zfile, base = _make_inputs(tmp_path)
    from c2ray_tpu.config import run3d_config_from_dict
    config = run3d_config_from_dict({
        "mesh": M,
        "nbody": {"type": "cubep3m", "redshift_file": zfile,
                  "boxsize": 0.7, "n_box": M, "base_dir": base,
                  "source_dir": base + "sources/"},
        "sed": {"bb": {"T_eff": 5.0e4, "S_star": 1.0e48}},
        "isothermal": True,
        "steps_per_slice": 1,
        "density_input": "files",
        "source_input": "catalog",
        "halo_model": {"uv_model": "Iliev et al",
                       "phot_per_atom": [2000.0, 2000.0],
                       "lifetime": 1.0e12},
        "results_dir": str(tmp_path / "results2"),
        "dump_dir": str(tmp_path),
    })
    run = Run3D(config)
    run.run(num_slices=1, write_output=False)
    first = run.last_suppression
    run.run(nz0=1, num_slices=1, write_output=False)
    second = run.last_suppression
    # slice 0: both halos shine (grid neutral); once the low-mass
    # halo's cell ionizes past StillNeutral=0.1 it is suppressed
    assert first.n_active == 2
    h1 = np.asarray(run.state.h1).reshape(M, M, M)
    if h1[3, 11, 5] > 0.1:   # its own cell ionized itself
        assert second.n_suppressed == 1
        assert second.n_active == 1
