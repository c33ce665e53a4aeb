"""Differential test: pyramid engine vs octant engine.

The dense skewed-octant engine is validated against the scalar
reference semantics (test_sweep3d); the pyramid engine must reproduce
it to float64 rounding on random fields, including photon loss.
"""

import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.sweep import SweepConfig
from c2ray_tpu.sweep.octant_sweep import sweep_octant_source_batch
from c2ray_tpu.sweep.pyramid_sweep import sweep_pyramid_source_batch
from c2ray_tpu.sweep.source_sweep import SourceFields
import pytest


def _run(M, lls):
    dtype = jnp.float64
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=1e48)),
        isothermal=False, dtype=dtype)
    cfg = SweepConfig(tables=tables, mesh=M, dr=10.0 * const.kpc / M,
                      isothermal=False, flux_scale=bands.flux_scale,
                      coldensh_LLS=lls)
    rng = np.random.RandomState(5)
    n = M**3
    fields = SourceFields(
        ndens=jnp.asarray(10.0 ** rng.uniform(-4, -2, n), dtype),
        h_av0=jnp.asarray(rng.uniform(0.2, 1.0, n), dtype),
        h_av1=jnp.asarray(rng.uniform(0.0, 0.8, n), dtype),
        he_av0=jnp.asarray(rng.uniform(0.2, 1.0, n), dtype),
        he_av1=jnp.asarray(rng.uniform(0.0, 0.5, n), dtype),
    )
    srcpos = jnp.asarray(rng.randint(0, M, size=(3, 3)), dtype=jnp.int32)
    nflux = jnp.asarray(np.concatenate(
        [rng.uniform(0.5, 2.0, (3, 1)), np.zeros((3, 2))], axis=1), dtype)
    oc = sweep_octant_source_batch(cfg, fields, srcpos, nflux)
    py = sweep_pyramid_source_batch(cfg, fields, srcpos, nflux)
    return oc, py


def _check(oc, py):
    for name in ("phih", "phihe0", "phihe1", "phiheat"):
        a = np.asarray(getattr(py, name))
        b = np.asarray(getattr(oc, name))
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10 * scale)
    np.testing.assert_allclose(float(py.photon_loss),
                               float(oc.photon_loss), rtol=1e-10)


def test_pyramid_matches_octant_m16():
    _check(*_run(16, 0.0))


@pytest.mark.slow
def test_pyramid_matches_octant_m32_lls():
    _check(*_run(32, 1.0e15))


@pytest.mark.slow
def test_subbox_radius_limits_trace_and_counts_loss():
    """radius=r zeroes rates outside the +-r subbox and books escaping
    photons as loss (evolve_source.F90:114-144)."""
    M = 16
    dtype = jnp.float64
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=1e48)),
        isothermal=True, dtype=dtype)
    cfg = SweepConfig(tables=tables, mesh=M, dr=10.0 * const.kpc / M,
                      isothermal=True, flux_scale=bands.flux_scale)
    n = M**3
    # transparent medium: photons stream freely
    fields = SourceFields(
        ndens=jnp.full(n, 1e-9, dtype), h_av0=jnp.full(n, 1e-3, dtype),
        h_av1=jnp.full(n, 1.0 - 1e-3, dtype),
        he_av0=jnp.full(n, 1e-3, dtype), he_av1=jnp.full(n, 1e-3, dtype))
    srcpos = jnp.asarray([[8, 8, 8]], dtype=jnp.int32)
    nflux = jnp.asarray([[1.0, 0.0, 0.0]], dtype)
    full = sweep_pyramid_source_batch(cfg, fields, srcpos, nflux)
    sub = sweep_pyramid_source_batch(cfg, fields, srcpos, nflux, radius=4)

    ph_full = np.asarray(full.phih).reshape(M, M, M)
    ph_sub = np.asarray(sub.phih).reshape(M, M, M)
    # inside the subbox: identical
    sl = slice(8 - 4, 8 + 5)
    np.testing.assert_allclose(ph_sub[sl, sl, sl], ph_full[sl, sl, sl],
                               rtol=1e-12)
    # outside: zero
    mask = np.ones((M, M, M), bool)
    mask[sl, sl, sl] = False
    assert np.all(ph_sub[mask] == 0.0)
    # escaping photons booked as loss: in a transparent medium nearly
    # all photons cross whichever boundary bounds the trace, so the
    # subbox loss matches the full-box loss up to the surface-geometry
    # discretisation of the flux estimate (photo_out / vol_ratio)
    assert float(sub.photon_loss) > 0.0
    np.testing.assert_allclose(float(sub.photon_loss),
                               float(full.photon_loss), rtol=0.05)


@pytest.mark.slow
def test_evolve3d_adaptive_subbox_matches_full():
    """In a transparent medium the adaptive subbox must expand to the
    full radius and reproduce the full-trace evolve3d exactly."""
    from c2ray_tpu.state import initial_grid_state
    from c2ray_tpu.sweep import build_shell_table
    from c2ray_tpu.sweep.evolve3d import Evolve3DConfig, evolve3d
    from c2ray_tpu.sweep.global_pass import ChemistryConfig

    M = 16
    dtype = jnp.float64
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=1e51)),
        isothermal=True, dtype=dtype)
    sweep_cfg = SweepConfig(tables=tables, mesh=M, dr=3.0 * const.kpc / M,
                            isothermal=True, flux_scale=bands.flux_scale)
    chem = ChemistryConfig(cooling=None, isothermal=True,
                           isothermal_temperature=1e4)
    shells = build_shell_table(M)
    srcpos = jnp.asarray([[8, 8, 8]], dtype=jnp.int32)
    nflux = jnp.asarray([[1.0, 0.0, 0.0]], dtype)
    dt = jnp.asarray(1e13, dtype)

    def run(use_subbox):
        cfg = Evolve3DConfig(sweep=sweep_cfg, chem=chem, shells=shells,
                             use_subbox=use_subbox, subbox_start=4)
        st = initial_grid_state(np.full((M,)*3, 1e-7), 0.0, 0.0, 0.0,
                                1e4, dtype=dtype)
        return evolve3d(cfg, st, srcpos, nflux, dt)

    st_a, stats_a = run(True)
    st_b, stats_b = run(False)
    assert stats_a.subbox_radius == M // 2
    np.testing.assert_allclose(np.asarray(st_a.h1), np.asarray(st_b.h1),
                               rtol=1e-12)


@pytest.mark.slow
def test_source_chunked_scan_matches_vmap():
    """The chunked-scan source batching (HBM guard for large meshes,
    e.g. 256^3 x 8 OOMs the plain vmap) must reproduce the vmap path
    exactly, including a chunk that does not divide the batch."""
    import dataclasses

    dtype = jnp.float64
    M = 12
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=1e48)),
        isothermal=False, dtype=dtype)
    cfg = SweepConfig(tables=tables, mesh=M, dr=10.0 * const.kpc / M,
                      isothermal=False, flux_scale=bands.flux_scale)
    rng = np.random.RandomState(8)
    n = M**3
    fields = SourceFields(
        ndens=jnp.asarray(10.0 ** rng.uniform(-4, -2, n), dtype),
        h_av0=jnp.asarray(rng.uniform(0.2, 1.0, n), dtype),
        h_av1=jnp.asarray(rng.uniform(0.0, 0.8, n), dtype),
        he_av0=jnp.asarray(rng.uniform(0.2, 1.0, n), dtype),
        he_av1=jnp.asarray(rng.uniform(0.0, 0.5, n), dtype),
    )
    srcpos = jnp.asarray(rng.randint(0, M, size=(5, 3)), dtype=jnp.int32)
    nflux = jnp.asarray(np.concatenate(
        [rng.uniform(0.5, 2.0, (5, 1)), np.zeros((5, 2))], axis=1), dtype)

    ref = sweep_pyramid_source_batch(cfg, fields, srcpos, nflux)
    for chunk in (1, 2, 3):
        cfg_c = dataclasses.replace(cfg, source_chunk=chunk)
        got = sweep_pyramid_source_batch(cfg_c, fields, srcpos, nflux)
        for name in ("phih", "phihe0", "phihe1", "phiheat"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)), rtol=1e-12,
                atol=1e-300, err_msg=f"chunk={chunk} {name}")
        np.testing.assert_allclose(float(got.photon_loss),
                                   float(ref.photon_loss), rtol=1e-12)
