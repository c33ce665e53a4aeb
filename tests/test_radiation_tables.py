"""Tests of the SED normalization and radiation tables.

Oracles: photon conservation (sum of band photo rates at tau=0 equals
S_star), monotonicity in tau, and the thin-limit identity
phi_thin(0) * dtau ~= phi_thick(0) - phi_thick(dtau) for small dtau.
"""

import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.radiation import (BlackBodySED, PowerLawSED, SEDConfig,
                                 build_radiation_tables, make_bands,
                                 photoion_rates)
from c2ray_tpu.radiation.tables import _tau_grid


def _bb_tables(isothermal=True, T_eff=5.0e4, S_star=1e48):
    sed = SEDConfig(bb=BlackBodySED(T_eff=T_eff, S_star=S_star))
    return build_radiation_tables(sed, isothermal=isothermal)


def test_bb_normalization_photon_conservation():
    """Sum over bands of the tau=0 thick table = S_star (the emitted
    ionizing photon rate), radiation_sed_parameters.f90:637-679."""
    tables, sed, bands = _bb_tables()
    total = float(jnp.sum(tables.bb.photo_thick[0, :]))
    np.testing.assert_allclose(total, sed.bb.S_star, rtol=2e-3)


def test_bb_tables_monotone_in_tau():
    tables, _, _ = _bb_tables()
    pt = np.asarray(tables.bb.photo_thick)
    assert np.all(np.diff(pt, axis=0) <= 1e-30)


def test_thin_limit_consistency():
    """For small dtau: thick(0) - thick(dtau) ~ dtau * thin(0), per band."""
    tables, _, _ = _bb_tables()
    tau = _tau_grid()
    pt = np.asarray(tables.bb.photo_thick)
    pn = np.asarray(tables.bb.photo_thin)
    # pick a tau row around 1e-6: large enough that the thick-table
    # difference is resolvable in f64, small enough for the linear limit
    i = 1167
    assert 3e-7 < tau[i] < 3e-6
    for b in (0, 5, 30):
        if pt[0, b] == 0.0:
            continue
        lhs = pt[0, b] - pt[i, b]
        rhs = tau[i] * pn[0, b]
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_heating_tables_built_when_not_isothermal():
    tables, _, bands = _bb_tables(isothermal=False)
    assert tables.bb.heat_thick.shape == (2001, bands.nheatbins)
    assert float(jnp.sum(tables.bb.heat_thick[0])) > 0.0
    # heating energies are bounded by h nu_max per photon
    mean_e = (float(jnp.sum(tables.bb.heat_thick[0, :1]))
              / float(jnp.sum(tables.bb.photo_thick[0, :1])))
    assert 0.0 < mean_e < const.hplanck * bands.freq_max[-1]


def test_photoion_rates_optically_thin_cell():
    """A tiny cell at the source absorbs ~ S_star * tau photons."""
    tables, sed, bands = _bb_tables()
    n_HI = 1e12  # tiny column
    vol = 1.0
    phi = photoion_rates(
        tables,
        jnp.float64(0.0), jnp.float64(n_HI),
        jnp.float64(0.0), jnp.float64(0.0),
        jnp.float64(0.0), jnp.float64(0.0),
        vol, jnp.float64(1e-3), nflux_bb=jnp.float64(1.0))
    # expected (thin branch): sum over bands of dtau_b * thin-table(0)
    expected = float(jnp.sum(tables.bb.photo_thin[0]
                             * n_HI * tables.sigma_HI))
    np.testing.assert_allclose(float(phi.photo_cell_HI), expected, rtol=1e-3)
    # all photons that went in either get absorbed or leave
    np.testing.assert_allclose(
        float(phi.photo_in - phi.photo_out), float(phi.photo_cell_HI),
        rtol=1e-10)


def test_photoion_rates_optically_thick_cell():
    """A very thick cell absorbs every photon entering it."""
    tables, sed, bands = _bb_tables()
    phi = photoion_rates(
        tables,
        jnp.float64(0.0), jnp.float64(1e30),
        jnp.float64(0.0), jnp.float64(1e29),
        jnp.float64(0.0), jnp.float64(1e28),
        1.0, jnp.float64(1e-3), nflux_bb=jnp.float64(1.0))
    total_cell = float(phi.photo_cell_HI + phi.photo_cell_HeI
                       + phi.photo_cell_HeII)
    np.testing.assert_allclose(total_cell, sed.bb.S_star, rtol=2e-3)
    assert float(phi.photo_out) < 1e-3 * sed.bb.S_star


def test_powerlaw_normalization():
    sed = SEDConfig(pl=PowerLawSED(index=2.5, S_star=1e47))
    tables, sed_n, bands = build_radiation_tables(sed)
    total = float(jnp.sum(tables.pl.photo_thick[0, :]))
    # the PL band range starts inside band 1 (pl_MinFreq = 300 eV would be
    # band 3); default nominal min_freq = 0.3 keV -> only band-3 subbands
    # above 300 eV plus the partial band carry flux
    assert total > 0.0
    # photon rate integrated over [min_freq, max_freq] equals S_star;
    # the tables cover whole sub-bands so the sum can exceed it slightly
    assert abs(total - sed_n.pl.S_star) / sed_n.pl.S_star < 0.25


def test_batch_shapes():
    tables, _, _ = _bb_tables()
    shape = (4, 7)
    z = jnp.zeros(shape)
    phi = photoion_rates(tables, z, z + 1e20, z, z + 1e19, z, z + 1e17,
                         jnp.ones(shape), z + 0.5,
                         nflux_bb=jnp.ones(shape))
    assert phi.photo_cell_HI.shape == shape
    assert bool(jnp.all(jnp.isfinite(phi.photo_cell_HI)))


def test_monochromatic_tables_attenuation():
    """Monochromatic mode (radiation_monocromatic.F90): one band, one
    node; the rate through a column must be S * (e^-tau_in - e^-tau_out)
    with the Verner cross section at the chosen energy."""
    import jax.numpy as jnp

    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.monochromatic import (build_monochromatic_tables,
                                                   verner_cross_section)
    from c2ray_tpu.radiation.quadrature import photoion_rates_quad

    S = 5.0e48
    qt, sed, bands = build_monochromatic_tables(
        SEDConfig(bb=BlackBodySED(T_eff=1e5, S_star=S)), 13.6)
    sig = verner_cross_section(13.6, 0)
    cd_in = jnp.asarray([0.0, 1.0e17, 3.0e18])
    cd_out = cd_in + 5.0e16
    z = jnp.zeros(3)
    phi = photoion_rates_quad(qt, cd_in, cd_out, z, z, z, z,
                              jnp.ones(3), z, nflux_bb=jnp.full(3, S))
    expected = S * S * (np.exp(-sig * np.asarray(cd_in))
                        - np.exp(-sig * np.asarray(cd_out)))
    np.testing.assert_allclose(np.asarray(phi.photo_cell_HI), expected,
                               rtol=1e-12)
