"""Integration: synthetic CubeP3M-style inputs -> readers -> driver slice.

Exercises the full external-data path of the reference
(mat_ini_cubep3m.F90 dens_ini + sourceprops_cubep3m.F90) with files
generated in the reference's formats.
"""

import numpy as np
import pytest
from scipy.io import FortranFile

from c2ray_tpu import constants as const
from c2ray_tpu.driver import Run3D, Run3DConfig
from c2ray_tpu.io.readers import (read_density_file, read_halo_catalog,
                                  _zred_str)
from c2ray_tpu.nbody import NBodyInterface, cubep3m_nbody
from c2ray_tpu.radiation.sed import BlackBodySED, SEDConfig
from c2ray_tpu.sources import (HaloSourceModel,
                               apply_suppression_and_luminosities)


@pytest.fixture
def synthetic_cubep3m(tmp_path):
    mesh = 8
    z = 9.0
    # redshift list file
    zfile = tmp_path / "redshifts.dat"
    zfile.write_text("2\n9.000\n8.892\n")
    nb = cubep3m_nbody(str(zfile), boxsize=10.0, n_box=64,
                       base_dir=str(tmp_path) + "/",
                       source_dir=str(tmp_path) + "/")
    # density cube in grid units with (m1,m2,m3) header
    dens_dir = tmp_path / "coarser_densities" / "halos_removed"
    dens_dir.mkdir(parents=True)
    rng = np.random.RandomState(2)
    cube = (1.0 + 0.3 * rng.rand(mesh, mesh, mesh)).astype(np.float32)
    with FortranFile(dens_dir / f"{_zred_str(z)}n_all.dat", "w") as f:
        f.write_record(np.asarray([mesh] * 3, dtype=np.int32))
        f.write_record(cube.ravel(order="F"))
    # halo catalog: (i, j, k, hmach, lmach), 1-based positions
    with open(tmp_path / f"{_zred_str(z)}_wsubgrid_sources.dat", "w") as f:
        f.write("2\n")
        f.write("4 4 4 5.0 0.0\n")
        f.write("2 6 3 0.0 2.0\n")
    return nb, mesh, z, cube


def test_density_reader_units(synthetic_cubep3m, tmp_path):
    nb, mesh, z, cube = synthetic_cubep3m
    nd = read_density_file(nb, z, mesh)
    # grid-unit conversion x (1+z)^3 (mat_ini_cubep3m.F90:300-351)
    expected = (cube.astype(np.float64)
                * nb.density_convert_grid(mesh) * (1 + z) ** 3)
    np.testing.assert_allclose(nd, expected, rtol=1e-12)
    # density close to the mean baryon density at z=9
    mean_b = (nb.cosmology.rho_crit_0 * nb.cosmology.Omega_B
              / (const.mu * const.m_p) * (1 + z) ** 3)
    # our synthetic cube is ~1.15 in grid units but n_box != mesh scales it
    assert 0.001 < nd.mean() / mean_b < 1000


def test_full_halo_pipeline(synthetic_cubep3m, tmp_path):
    nb, mesh, z, cube = synthetic_cubep3m
    sed = SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=1e48))

    config = Run3DConfig(
        mesh=mesh, nbody=nb, sed=sed, isothermal=True, steps_per_slice=1,
        results_dir=str(tmp_path / "results"), dump_dir=str(tmp_path))
    run = Run3D(config)

    ndens = read_density_file(nb, z, mesh)
    catalog = read_halo_catalog(nb, z)
    assert catalog.pos.shape == (2, 3)
    np.testing.assert_array_equal(catalog.pos[0], [3, 3, 3])  # 0-based

    model = HaloSourceModel(M_grid=nb.M_grid, Omega_B=nb.cosmology.Omega_B,
                            Omega0=nb.cosmology.Omega0)
    xh1 = np.zeros((mesh, mesh, mesh))
    sources, stats = apply_suppression_and_luminosities(
        catalog, xh1, model, run.sed, model.lifetime)
    assert stats.n_active == 2  # neutral box: both halos shine

    run.run_slice(0, sources, ndens=ndens, write_output=True)
    h1 = np.asarray(run.state.h1)
    assert np.isfinite(h1).all()
    assert h1.max() > 1e-6   # something ionized
    # output cube exists for the end-of-slice redshift
    z2 = float(nb.zred_array[1])
    assert (tmp_path / "results" / f"xfrac3d_{_zred_str(z2)}.bin").exists()


def test_lg_density_reader(tmp_path):
    """LG format: slice-numbered file, (m1,m2,m3) header record, one
    f32 record per z-plane, M0Mpc3 mass units, empty-cell floor and
    H-part factor (dens_ini, mat_ini_LG.F90:147-284)."""
    from c2ray_tpu.io.readers import read_lg_density_file
    from c2ray_tpu.nbody import lg_nbody

    mesh, z, nz = 6, 8.0, 3
    zfile = tmp_path / "redshifts.dat"
    zfile.write_text("2\n8.000\n7.900\n")
    nb = lg_nbody(str(zfile), boxsize=64.0,
                  base_dir=str(tmp_path) + "/", id_str="LGtest")
    rng = np.random.RandomState(5)
    cube = rng.uniform(1e8, 1e10, (mesh, mesh, mesh)).astype(np.float32)
    cube[0, 0, 0] = 0.0      # empty cell -> floored
    with FortranFile(tmp_path / f"{nz:03d}rho_LGtest.dat", "w") as f:
        f.write_record(np.asarray([mesh] * 3, dtype=np.int32))
        for k in range(mesh):
            f.write_record(np.asarray(cube[:, :, k]).ravel(order="F"))

    nd = read_lg_density_file(nb, z, nz, mesh)
    p = nb.cosmology
    convert = (const.M_SOLAR / const.Mpc**3 * p.h**2
               * p.Omega_B / p.Omega0 / (const.mu * const.m_p)
               * (1 + z) ** 3)
    expected = cube.astype(np.float64) * convert
    expected[0, 0, 0] = 0.001 * convert
    expected *= (1.0 - const.abu_he)
    np.testing.assert_allclose(nd, expected, rtol=1e-12)

    # dmdens_cic naming variant (mat_ini_LG.F90:188-191)
    nb2 = lg_nbody(str(zfile), boxsize=64.0,
                   base_dir=str(tmp_path) + "/", id_str="dmdens_cic")
    with FortranFile(tmp_path / f"{nz:03d}dmdens_cic.dat", "w") as f:
        f.write_record(np.asarray([mesh] * 3, dtype=np.int32))
        for k in range(mesh):
            f.write_record(np.asarray(cube[:, :, k]).ravel(order="F"))
    nd2 = read_lg_density_file(nb2, z, nz, mesh)
    np.testing.assert_allclose(nd2, nd, rtol=1e-12)


def test_pmfast_binary_density_reader(tmp_path):
    """PMFAST format: raw f32 stream, no record markers, no header
    (densityformat="binary", densityheader=.false., pmfast.F90:59-63),
    grid units (pmfast.F90:68)."""
    from c2ray_tpu.io.fortran_records import read_unformatted_cube
    from c2ray_tpu.io.readers import read_density_file
    from c2ray_tpu.nbody import pmfast_nbody

    mesh, z = 6, 9.0
    zfile = tmp_path / "redshifts.dat"
    zfile.write_text("1\n9.000\n")
    nb = pmfast_nbody(str(zfile), boxsize=50.0, n_box=128,
                      base_dir=str(tmp_path) + "/")
    rng = np.random.RandomState(6)
    cube = (1.0 + 0.2 * rng.rand(mesh, mesh, mesh)).astype(np.float32)
    (tmp_path / "coarser_densities").mkdir()
    path = tmp_path / "coarser_densities" / f"{_zred_str(z)}n_all.dat"
    with open(path, "wb") as f:
        f.write(np.asarray(cube).tobytes(order="F"))

    raw = read_unformatted_cube(str(path), mesh=mesh, markers=False,
                                header=False)
    np.testing.assert_array_equal(raw, cube)
    nd = read_density_file(nb, z, mesh, markers=False, header=False)
    expected = (cube.astype(np.float64)
                * nb.density_convert_grid(mesh) * (1 + z) ** 3)
    np.testing.assert_allclose(nd, expected, rtol=1e-12)


def test_gadget_nbody_interface(tmp_path):
    """GADGET backend (marked broken in the reference,
    files_for_3D/Makefile:21): the interface contract still holds."""
    from c2ray_tpu.nbody import gadget_nbody

    zfile = tmp_path / "redshifts.dat"
    zfile.write_text("3\n9.0\n8.5\n8.0\n")
    nb = gadget_nbody(str(zfile), boxsize=20.0,
                      base_dir=str(tmp_path) + "/")
    assert nb.nbody_type == "gadget"
    assert nb.num_zred == 3
    np.testing.assert_allclose(nb.zred_array, [9.0, 8.5, 8.0])
    assert nb.M_box > 0 and nb.tscale > 0
