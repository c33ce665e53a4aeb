"""Pin the adaptive ("auto") quadrature against the fixed 8-node rule
and the tau-table path.

The error-budgeted uniform-K band blocks (quadrature.py:_band_nodes_auto)
claim <= AUTO_NODE_TOL relative error on every band integral vs a dense
reference.  These tests make that claim executable: the summed photo /
heating rates from the auto path must match the fixed high-node rule
over the full optical-depth range tau in [1e-8, 1e7] for every SED type
(BB + PL + QSO), isothermal and heating, and must agree with the
tau-table parity path (radiation_photoionrates.f90:331-464) within the
table's own interpolation error.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from c2ray_tpu.radiation import (BlackBodySED, PowerLawSED, SEDConfig,
                                 build_radiation_tables, photoion_rates)
from c2ray_tpu.radiation.quadrature import (build_quadrature_tables,
                                            photoion_rates_quad)

# QSO uses the PowerLawSED container in the qso slot (sed.py)
SED_ALL = SEDConfig(bb=BlackBodySED(T_eff=5.0e4, S_star=1.0e48),
                    pl=PowerLawSED(index=2.5, S_star=3.0e46),
                    qso=PowerLawSED(index=1.8, S_star=1.0e46))


def _columns(n=40):
    """Column-density sets spanning tau_HI in ~[1e-8, 1e7]."""
    # sigma_HI ~ 6.3e-18 cm^2 -> N_HI in [1e10, 1e25] covers the range
    cd_in = np.logspace(10.0, 24.5, n)
    dcol = 0.03 * cd_in + 1.0e10
    z = np.zeros(n)
    return (jnp.asarray(cd_in), jnp.asarray(cd_in + dcol),
            jnp.asarray(0.08 * cd_in), jnp.asarray(0.08 * (cd_in + dcol)),
            jnp.asarray(0.008 * cd_in), jnp.asarray(0.008 * (cd_in + dcol)),
            jnp.asarray(z))


def _rates(qt, cols, heating):
    ci, co, hi_, ho, hhi, hho, z = cols
    n = ci.shape[0]
    one = jnp.ones(n)
    return photoion_rates_quad(
        qt, ci, co, hi_, ho, hhi, hho, one, z + 0.5,
        nflux_bb=one, nflux_pl=one, nflux_qso=one, do_heating=heating)


@pytest.mark.parametrize("isothermal", [True, False])
def test_auto_blocks_match_fixed_rule(isothermal):
    """Auto band blocks vs the fixed 8-node rule: every output field
    agrees to ~1e-5 relative (budget 1e-6 per band integral plus
    cross-band cancellation headroom) over tau in [1e-8, 1e7]."""
    cols = _columns()
    qt_auto, _, _ = build_quadrature_tables(
        SED_ALL, isothermal=isothermal, n_nodes="auto", flux_scale=1.0,
        dtype=jnp.float64)
    qt_8, _, _ = build_quadrature_tables(
        SED_ALL, isothermal=isothermal, n_nodes=8, flux_scale=1.0, dtype=jnp.float64)

    ra = _rates(qt_auto, cols, heating=not isothermal)
    r8 = _rates(qt_8, cols, heating=not isothermal)

    for name in ("photo_cell_HI", "photo_cell_HeI", "photo_cell_HeII",
                 "photo_in", "photo_out") + (
                     () if isothermal else ("heat",)):
        a = np.asarray(getattr(ra, name))
        b = np.asarray(getattr(r8, name))
        scale = np.abs(b).max()
        if scale == 0.0:
            continue
        # relative where resolvable, absolute (vs the field's scale)
        # for the tiny tail rates
        err = np.abs(a - b) / np.maximum(np.abs(b), 1e-10 * scale)
        mask = np.abs(b) > 1e-10 * scale
        assert err[mask].max() < 2e-5, (name, err[mask].max())


def test_auto_blocks_match_tau_table_path():
    """Auto quadrature vs the reference-parity tau-table lookup
    (radiation_photoionrates.f90:331-464): the dominant photo rate
    agrees within the 2001-row table's linear-interpolation error."""
    cols = _columns(24)
    ci, co, hi_, ho, hhi, hho, z = cols
    n = ci.shape[0]
    one = jnp.ones(n)

    qt, _, _ = build_quadrature_tables(
        SED_ALL, isothermal=True, n_nodes="auto", flux_scale=1.0,
        dtype=jnp.float64)
    rq = _rates(qt, cols, heating=False)

    tables, _, _ = build_radiation_tables(SED_ALL, isothermal=True)
    rt = photoion_rates(tables, ci, co, hi_, ho, hhi, hho,
                        one, z + 0.5, nflux_bb=one, nflux_pl=one,
                        nflux_qso=one)

    a = np.asarray(rq.photo_cell_HI)
    b = np.asarray(rt.photo_cell_HI)
    scale = np.abs(b).max()
    mask = np.abs(b) > 1e-8 * scale
    err = np.abs(a - b)[mask] / np.abs(b)[mask]
    # the table path carries ~1e-4 linear-interpolation error between
    # its tau rows; the quadrature is the more accurate of the two
    assert err.max() < 5e-3, err.max()


def test_auto_heating_matches_dense_reference():
    """Heating rates from the auto blocks vs a dense 32-node rule:
    the per-band 1e-6 budget must survive the species split."""
    cols = _columns()
    qt_auto, _, _ = build_quadrature_tables(
        SED_ALL, isothermal=False, n_nodes="auto", flux_scale=1.0,
        dtype=jnp.float64)
    qt_32, _, _ = build_quadrature_tables(
        SED_ALL, isothermal=False, n_nodes=32, flux_scale=1.0, dtype=jnp.float64)
    ra = _rates(qt_auto, cols, heating=True)
    rd = _rates(qt_32, cols, heating=True)
    a = np.asarray(ra.heat)
    b = np.asarray(rd.heat)
    scale = np.abs(b).max()
    mask = np.abs(b) > 1e-10 * scale
    err = np.abs(a - b)[mask] / np.abs(b)[mask]
    assert err.max() < 5e-5, err.max()


def test_default_rule_matches_dense_reference():
    """The shipped DEFAULT_NODES rule must reproduce a dense 48-node
    reference to ~1e-5 on every output field over tau in [1e-8, 1e7]
    (the round-5 A/B that set DEFAULT_NODES=6)."""
    from c2ray_tpu.radiation.quadrature import DEFAULT_NODES

    sed = SEDConfig(bb=BlackBodySED(T_eff=5.0e4, S_star=1.0e48))
    cols = _columns()
    for heating in (False, True):
        qt_ref, _, _ = build_quadrature_tables(
            sed, isothermal=not heating, n_nodes=48, flux_scale=1.0,
            dtype=jnp.float64)
        qt_def, _, _ = build_quadrature_tables(
            sed, isothermal=not heating, n_nodes=DEFAULT_NODES,
            flux_scale=1.0, dtype=jnp.float64)
        ci, co, hi_, ho, hhi, hho, z = cols
        one = jnp.ones(ci.shape[0])
        kw = dict(nflux_bb=one, do_heating=heating)
        r = photoion_rates_quad(qt_ref, ci, co, hi_, ho, hhi, hho,
                                one, z + 0.5, **kw)
        t = photoion_rates_quad(qt_def, ci, co, hi_, ho, hhi, hho,
                                one, z + 0.5, **kw)
        for name in ("photo_cell_HI", "photo_cell_HeI",
                     "photo_cell_HeII", "heat"):
            a = np.asarray(getattr(r, name))
            b = np.asarray(getattr(t, name))
            if a.size == 0 or np.all(a == 0):
                continue
            scale = np.maximum(np.abs(a), np.abs(a).max() * 1e-12)
            assert np.max(np.abs(b - a) / scale) < 1e-5, name
