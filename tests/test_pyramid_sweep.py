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


def test_pyramid_matches_octant_m32_lls():
    _check(*_run(32, 1.0e15))
