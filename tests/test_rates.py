"""Unit tests for the T-dependent rate coefficients (cgsconstants.f90 fits)."""

import jax.numpy as jnp
import numpy as np

from c2ray_tpu import constants as const
from c2ray_tpu.rates import constant_rate_coefficients, rate_coefficients


def test_rates_at_1e4K_match_reference_constants():
    """The Hui&Gnedin/Cox fits at T=1e4 K must reproduce the hardcoded
    constants of ini_recombinations_collisional_ionizations_constant
    (cgsconstants.f90:270-289) to fit accuracy."""
    r = rate_coefficients(jnp.asarray(1.0e4, dtype=jnp.float64))
    c = constant_rate_coefficients()
    np.testing.assert_allclose(float(r.brech0), float(c.brech0), rtol=1e-4)
    np.testing.assert_allclose(float(r.arech0), float(c.arech0), rtol=1e-4)
    np.testing.assert_allclose(float(r.breche0), float(c.breche0), rtol=1e-3)
    np.testing.assert_allclose(float(r.areche0), float(c.areche0), rtol=1e-3)
    np.testing.assert_allclose(float(r.breche1), float(c.breche1), rtol=1e-3)
    np.testing.assert_allclose(float(r.areche1), float(c.areche1), rtol=1e-3)
    # The reference's constant variant takes its collisional rates from a
    # different fit ("from Gabriel", cgsconstants.f90:272), so only
    # order-of-magnitude agreement with the Cox (1970) fit is expected.
    np.testing.assert_allclose(float(r.colli_HI), float(c.colli_HI), rtol=0.15)
    np.testing.assert_allclose(float(r.colli_HeI), float(c.colli_HeI), rtol=0.5)
    np.testing.assert_allclose(float(r.colli_HeII), float(c.colli_HeII), rtol=0.1)
    np.testing.assert_allclose(float(r.v), 0.285, rtol=1e-12)


def test_rates_vectorized_shapes():
    T = jnp.logspace(1, 9, 801)
    r = rate_coefficients(T)
    for leaf in r:
        assert leaf.shape == T.shape
        assert bool(jnp.all(jnp.isfinite(leaf)))
        assert bool(jnp.all(leaf >= 0.0))


def test_case_b_below_case_a():
    T = jnp.logspace(2, 7, 100)
    r = rate_coefficients(T)
    assert bool(jnp.all(r.brech0 < r.arech0))
    assert bool(jnp.all(r.breche1 < r.areche1))
