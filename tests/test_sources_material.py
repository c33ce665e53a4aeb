"""Tests for source models (suppression, UV models) and material models."""

import numpy as np
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.material import ClumpingModel, LLSModel
from c2ray_tpu.nbody import test_nbody as make_test_nbody, test4_nbody as make_test4_nbody
from c2ray_tpu.radiation.sed import BlackBodySED, SEDConfig, normalize_seds
from c2ray_tpu.sources import (HaloCatalog, HaloSourceModel, SourceList,
                               apply_suppression_and_luminosities,
                               controlled_permutation,
                               randomize_source_order,
                               make_test_sources)


def _sed():
    sed = SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=1e48))
    return normalize_seds(sed, const.ion_freq_HI, const.ion_freq_HeII * 100)


def test_test_sources_normalization():
    sed = _sed()
    src = make_test_sources(np.array([[1, 2, 3]]), [5e48], sed)
    np.testing.assert_allclose(src.nflux[0, 0], 5.0, rtol=1e-12)


def test_suppression_iliev_model():
    """Low-mass sources only shine in still-neutral cells
    (sourceprops_cubep3m.F90:354-397)."""
    sed = _sed()
    mesh = 8
    xh1 = np.zeros((mesh, mesh, mesh))
    xh1[4, 4, 4] = 0.9   # ionized cell
    cat = HaloCatalog(
        pos=np.array([[2, 2, 2], [4, 4, 4], [6, 6, 6]]),
        mass_hmach=np.array([0.0, 0.0, 5.0]),
        mass_lmach=np.array([3.0, 3.0, 0.0]),
    )
    nb = make_test_nbody()
    model = HaloSourceModel(M_grid=nb.M_grid)
    dt = model.lifetime
    src, stats = apply_suppression_and_luminosities(cat, xh1, model, sed, dt)
    # low-mass at (2,2,2) active (neutral); at (4,4,4) suppressed;
    # high-mass at (6,6,6) always active
    assert stats.n_active == 2
    assert stats.n_suppressed == 1
    assert stats.n_massive == 1
    # active source luminosities follow the Iliev et al model
    expected_lm = (3.0 * model.phot_per_atom[1] * nb.M_grid
                   * model.Omega_B / (model.Omega0 * const.m_p)
                   / (sed.bb.S_star * model.lifetime))
    i_lm = list(map(tuple, src.srcpos)).index((2, 2, 2))
    np.testing.assert_allclose(src.nflux[i_lm, 0], expected_lm, rtol=1e-10)


def test_fixed_ngamma_model_budget():
    """Fixed N_gamma distributes the slice photon budget by mass and
    carries over unspent photons (sourceprops_cubep3m.F90:560-585)."""
    sed = _sed()
    cat = HaloCatalog(pos=np.array([[1, 1, 1], [2, 2, 2]]),
                      mass_hmach=np.array([1.0, 3.0]),
                      mass_lmach=np.zeros(2))
    nb = make_test_nbody()
    model = HaloSourceModel(M_grid=nb.M_grid, uv_model="Fixed N_gamma",
                            uv_array=np.array([4e60]))
    src, _ = apply_suppression_and_luminosities(
        cat, np.zeros((4, 4, 4)), model, sed, model.lifetime)
    total_photons = src.nflux[:, 0].sum() * sed.bb.S_star * model.lifetime
    np.testing.assert_allclose(total_photons, 4e60, rtol=1e-10)
    # mass-proportional split
    np.testing.assert_allclose(src.nflux[1, 0] / src.nflux[0, 0], 3.0,
                               rtol=1e-10)


def test_controlled_permutation_locality():
    """ctrper keeps elements near their initial position for small
    degree (ctrper.f90:22-30)."""
    n = 1000
    p_small = controlled_permutation(n, 0.05, rng=1)
    p_large = controlled_permutation(n, 10.0, rng=1)
    assert np.abs(p_small - np.arange(n)).mean() < np.abs(
        p_large - np.arange(n)).mean()
    assert sorted(p_small.tolist()) == list(range(n))


def test_randomize_source_order_preserves_set():
    src = SourceList(srcpos=np.arange(30).reshape(10, 3).astype(np.int32),
                     nflux=np.random.rand(10, 3))
    out = randomize_source_order(src, rng=0)
    assert sorted(map(tuple, out.srcpos)) == sorted(map(tuple, src.srcpos))


def test_clumping_models():
    assert ClumpingModel(1, 2.5).at_redshift(9.0) == 2.5
    # redshift fits decrease toward high z (mat_ini_test.F90:526-533)
    for t in (2, 3, 4):
        m = ClumpingModel(t)
        assert m.at_redshift(6.0) > m.at_redshift(12.0)
        assert m.at_redshift(9.0) > 1.0
    grid = np.ones((4, 4, 4)) * 3.0
    assert np.all(ClumpingModel(5, grid=grid).at_redshift(7.0) == 3.0)


def test_lls_model():
    m = LLSModel(type_of_LLS=1).initialised(0.0, 3.0e21)
    assert m.n_LLS > 0.0
    col = m.coldensh_per_cell()
    assert col > 0.0
    # cosmological evolution densifies LLSs toward lower z
    m2 = m.evolve(zfactor=1.1)
    assert m2.n_LLS < m.n_LLS
    assert LLSModel(type_of_LLS=0).coldensh_per_cell() == 0.0
    assert np.isfinite(m.mean_free_path_pMpc(3.0e21))


def test_compressed_fraction_codec():
    """Sign-coded single-value storage keeps the small fraction at full
    precision on both sides of 0.5 (mat_ini_cubep3m_compr.F90:454-471)."""
    from c2ray_tpu.material import (compress_ionized_fraction,
                                    ionized_from_compr,
                                    neutral_from_compr)

    x = np.array([0.0, 1e-12, 0.3, 0.5, 0.9, 1.0 - 1e-12, 1.0])
    a = compress_ionized_fraction(x)
    np.testing.assert_allclose(ionized_from_compr(a), x, rtol=0, atol=0)
    np.testing.assert_allclose(neutral_from_compr(a), 1.0 - x,
                               rtol=1e-12, atol=0)
    # the small side keeps full *relative* precision even in float32
    # storage: a nearly-ionized cell stores -x_HI directly, so decoding
    # recovers x_HI to f32 rounding (uncompressed f32 x_HII storage
    # would return 1 - float32(1 - 1e-12) = 0 here)
    a32 = np.float32(-1e-12)
    np.testing.assert_allclose(neutral_from_compr(np.float64(a32)),
                               1e-12, rtol=1e-6)
    assert 1.0 - np.float64(np.float32(1.0 - 1e-12)) == 0.0
