"""I/O round-trip tests, cross-checked against scipy's Fortran reader."""

import numpy as np
import pytest
from scipy.io import FortranFile

from c2ray_tpu.io import (read_unformatted_cube, write_unformatted_cube)
from c2ray_tpu.io.checkpoint import (load_iterdump, load_source_list,
                                     save_iterdump, save_source_list)
from c2ray_tpu.sources import SourceList


def test_cube_roundtrip(tmp_path):
    cube = np.random.rand(6, 6, 6).astype(np.float64)
    p = tmp_path / "cube.bin"
    write_unformatted_cube(p, cube)
    back = read_unformatted_cube(p, dtype=np.float64)
    np.testing.assert_array_equal(back, cube)


def test_cube_matches_fortran_convention(tmp_path):
    """Our writer must produce files scipy's FortranFile can parse as
    (header record, data record) -- the reference's format
    (output.F90:268-272)."""
    cube = np.arange(4 * 4 * 4, dtype=np.float64).reshape(4, 4, 4)
    p = tmp_path / "cube.bin"
    write_unformatted_cube(p, cube)
    with FortranFile(p, "r") as f:
        hdr = f.read_ints(np.int32)
        data = f.read_reals(np.float64)
    np.testing.assert_array_equal(hdr, [4, 4, 4])
    np.testing.assert_array_equal(data.reshape((4, 4, 4), order="F"), cube)


def test_cube_read_from_fortranfile(tmp_path):
    """Files written Fortran-side (scipy proxy) read back correctly."""
    cube = np.random.rand(5, 5, 5).astype(np.float32)
    p = tmp_path / "dens.dat"
    with FortranFile(p, "w") as f:
        f.write_record(np.asarray(cube.shape, dtype=np.int32))
        f.write_record(cube.ravel(order="F"))
    back = read_unformatted_cube(p, dtype=np.float32)
    np.testing.assert_array_equal(back, cube)


def test_headerless_stream_cube(tmp_path):
    cube = np.random.rand(4, 4, 4).astype(np.float32)
    p = tmp_path / "raw.dat"
    write_unformatted_cube(p, cube, markers=False, header=False)
    back = read_unformatted_cube(p, dtype=np.float32, mesh=4,
                                 markers=False, header=False)
    np.testing.assert_array_equal(back, cube)


def test_iterdump_roundtrip(tmp_path):
    import jax.numpy as jnp

    from c2ray_tpu.state import initial_grid_state
    from c2ray_tpu.sweep.source_sweep import zero_rate_grids

    state = initial_grid_state(np.random.rand(4, 4, 4), 0.1, 0.05, 0.01,
                               1.0e4)
    rates = zero_rate_grids(4, jnp.float64)
    save_iterdump(str(tmp_path), 7, state, rates)
    niter, s2, r2 = load_iterdump(str(tmp_path), type(state), type(rates))
    assert niter == 7
    np.testing.assert_array_equal(np.asarray(state.h1), s2.h1)
    np.testing.assert_array_equal(np.asarray(rates.phih), r2.phih)


def test_source_list_roundtrip(tmp_path):
    src = SourceList(srcpos=np.array([[1, 2, 3], [4, 5, 6]],
                                     dtype=np.int32),
                     nflux=np.array([[1.0, 0.0, 0.0], [0.5, 0.2, 0.0]]))
    p = tmp_path / "srcs.dat"
    save_source_list(p, src)
    back = load_source_list(p)
    np.testing.assert_array_equal(back.srcpos, src.srcpos)
    np.testing.assert_allclose(back.nflux, src.nflux, rtol=1e-7)


def test_compressed_ion_stream(tmp_path):
    """The _compr output family: sign-coded H-only snapshot cube
    round-trips with full precision in the small fraction
    (output_compr.F90; codec mat_ini_cubep3m_compr.F90:454-471)."""
    from c2ray_tpu.io.readers import read_compressed_ion_cube
    from c2ray_tpu.io.writers import OutputStreams, OutputWriter

    M = 8
    rng = np.random.RandomState(2)
    xh1 = np.concatenate([rng.uniform(0, 1e-12, M**3 // 2),
                          1.0 - rng.uniform(0, 1e-12, M**3 // 2)])
    xh1 = xh1.reshape(M, M, M)
    xh = np.stack([1.0 - xh1, xh1], axis=-1)
    xhe = np.zeros((M, M, M, 3))
    w = OutputWriter(str(tmp_path), OutputStreams(ion_cubes=False,
                                                  compressed_ion=True))
    w.write(7.0, xh=xh, xhe=xhe, ndens=np.ones((M, M, M)))
    got = read_compressed_ion_cube(str(tmp_path / "xh_compr_7.000.bin"))
    # exact round-trip: the stored small fraction keeps full precision
    np.testing.assert_array_equal(got, xh1)
