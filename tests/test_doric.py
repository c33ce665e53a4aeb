"""Tests of the doric analytic ionization ODE solver (doric.f90:35-313).

The oracle is an independent matrix-exponential integration (scipy) of
the same linear ODE  dx/dt = M x + g :  this validates the hand-rolled
3-eigenvalue solution and the time-averaging factors without sharing any
of the solution algebra.  Tolerances are a few 1e-5: that is the
intrinsic accuracy of the reference's eigen-algebra in float64
(cancellation in the B +/- S terms, doric.f90:158-212), measured against
the numpy/scipy eigendecomposition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from c2ray_tpu import constants as const
from c2ray_tpu.chemistry import (DoricFactors, IonFractions, IonState,
                                 coldens, doric, electrondens, ion_fractions,
                                 prepare_doric_factors)
from c2ray_tpu.rates import rate_coefficients

EPS = 1.0e-20


def make_state(h1, he1, he2):
    f = ion_fractions(jnp.float64(h1), jnp.float64(he1), jnp.float64(he2))
    return IonState(cur=f, avg=f, old=f)


def build_matrix(ne, photo, ion, factors, rates, clumping=1.0):
    """Reconstruct M and g of the ODE from the doric definitions
    (doric.f90:91-135) using numpy only."""
    pfrac = 0.96
    heliumfraction = const.abu_he / (1.0 - const.abu_he)
    ffrac = min(max(10.0 * float(ion.cur.h0), 0.01), 1.0)
    wfrac = (1.425 - 0.737) + 0.737 * float(factors.yfrac)
    v = float(rates.v)

    a_h_B = clumping * float(rates.brech0)
    a_he_1 = clumping * float(rates.oreche0)
    a_he_B = clumping * float(rates.breche0)
    a_he_A = clumping * float(rates.areche0)
    a_he2_B = clumping * float(rates.breche1)
    a_he2_A = clumping * float(rates.areche1)
    a_he2_2 = clumping * float(rates.treche1)
    a_he2_1 = a_he2_A - a_he2_B

    aih0 = max(photo[0] + ne * float(rates.colli_HI), 1e-200)
    aihe0 = max(photo[1] + ne * float(rates.colli_HeI), 1e-200)
    aihe1 = max(photo[2] + ne * float(rates.colli_HeII), 1e-200)

    yfrac = float(factors.yfrac)
    zfrac = float(factors.zfrac)
    y2a = float(factors.y2afrac)
    y2b = float(factors.y2bfrac)

    L = -(aih0 + ne * a_h_B)
    M_ = (yfrac * ne * a_he_1 + pfrac * ne * a_he_B) * heliumfraction
    N = ((ffrac * zfrac * (1 - v) + v * wfrac) * a_he2_B + a_he2_2
         + (1 - y2a - y2b) * a_he2_1) * heliumfraction * ne
    P = -aihe0 - aihe1 - ne * (a_he_A - (1 - yfrac) * a_he_1)
    E = -ne * (a_he2_A - y2a * a_he2_1)
    Q = (-aihe0 + ne * a_he2_B * (ffrac * (1 - zfrac) * (1 - v)
                                  + v * (1.425 - wfrac)) - E
         + a_he2_1 * y2b * ne)

    Mmat = np.array([[L, M_, N], [0.0, P, Q], [0.0, aihe1, E]])
    g = np.array([aih0, aihe0, 0.0])
    return Mmat, g


def expm_solution(Mmat, g, x0, dt):
    """x(dt) and the time average of x over [0, dt] via matrix exponentials."""
    xeq = -np.linalg.solve(Mmat, g)
    ed = scipy.linalg.expm(Mmat * dt)
    x_end = xeq + ed @ (x0 - xeq)
    # time average: xeq + (1/dt) M^-1 (e^{M dt} - I)(x0 - xeq)
    x_avg = xeq + np.linalg.solve(Mmat, (ed - np.eye(3)) @ (x0 - xeq)) / dt
    return x_end, x_avg


def run_case(h1, he1, he2, ne, photo, dt, T=1.0e4):
    rates = rate_coefficients(jnp.float64(T))
    ion = make_state(h1, he1, he2)
    ndens = 1.0e-3
    path = 3.0e20
    NHI = coldens(path, ion.cur.h0, ndens, 1.0 - const.abu_he)
    NHeI = coldens(path, ion.cur.he0, ndens, const.abu_he)
    NHeII = coldens(path, ion.cur.he1, ndens, const.abu_he)
    factors = prepare_doric_factors(NHI, NHeI, NHeII)

    out = doric(dt, jnp.float64(ne), ion, jnp.float64(photo[0]),
                jnp.float64(photo[1]), jnp.float64(photo[2]),
                factors, rates, clumping=1.0, epsilon=EPS)

    Mmat, g = build_matrix(ne, photo, ion, factors, rates)
    x0 = np.array([h1, he1, he2])
    x_end, x_avg = expm_solution(Mmat, g, x0, dt)
    return out, x_end, x_avg


def test_doric_vs_matrix_exponential_ionizing():
    out, x_end, x_avg = run_case(
        h1=1e-3, he1=1e-3, he2=1e-6, ne=1.1e-3,
        photo=(1e-11, 8e-12, 1e-13), dt=3.0e11)
    np.testing.assert_allclose(float(out.cur.h1), x_end[0], rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(float(out.cur.he1), x_end[1], rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(float(out.cur.he2), x_end[2], rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(float(out.avg.h1), x_avg[0], rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(float(out.avg.he1), x_avg[1], rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(float(out.avg.he2), x_avg[2], rtol=5e-5, atol=1e-10)


def test_doric_vs_matrix_exponential_recombining():
    out, x_end, x_avg = run_case(
        h1=0.999, he1=0.8, he2=0.19, ne=1.2e-3,
        photo=(1e-16, 1e-17, 1e-18), dt=1.0e13)
    np.testing.assert_allclose(float(out.cur.h1), x_end[0], rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(float(out.cur.he1), x_end[1], rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(float(out.cur.he2), x_end[2], rtol=5e-5, atol=1e-10)
    np.testing.assert_allclose(float(out.avg.h1), x_avg[0], rtol=5e-5, atol=1e-10)


def test_doric_long_dt_reaches_equilibrium_fixed_point():
    """For dt >> all timescales the solution is the particular solution;
    re-applying doric from it must be a fixed point."""
    rates = rate_coefficients(jnp.float64(1.0e4))
    factors = DoricFactors(yfrac=jnp.float64(0.6), zfrac=jnp.float64(0.5),
                           y2afrac=jnp.float64(0.3), y2bfrac=jnp.float64(0.4))
    ion = make_state(0.5, 0.3, 0.1)
    args = dict(ne=jnp.float64(1e-3), photo_HI=jnp.float64(1e-12),
                photo_HeI=jnp.float64(5e-13), photo_HeII=jnp.float64(1e-14),
                factors=factors, rates=rates)
    out1 = doric(1.0e18, args["ne"], ion, args["photo_HI"], args["photo_HeI"],
                 args["photo_HeII"], factors, rates)
    eq = IonState(cur=out1.cur, avg=out1.cur, old=out1.cur)
    out2 = doric(1.0e18, args["ne"], eq, args["photo_HI"], args["photo_HeI"],
                 args["photo_HeII"], factors, rates)
    # ffrac depends on the current h0 (doric.f90:93), so the equilibrium
    # shifts slightly between the two calls; only near-fixed-point holds.
    np.testing.assert_allclose(float(out2.cur.h1), float(out1.cur.h1), rtol=1e-3)
    np.testing.assert_allclose(float(out2.cur.he1), float(out1.cur.he1), rtol=1e-3)
    np.testing.assert_allclose(float(out2.cur.he2), float(out1.cur.he2), rtol=1e-3)


def test_doric_vectorized_over_grid():
    rates = rate_coefficients(jnp.full((4, 5), 1.0e4))
    h1 = jnp.full((4, 5), 1e-3)
    ion0 = ion_fractions(h1, h1, h1 * 1e-3)
    ion = IonState(cur=ion0, avg=ion0, old=ion0)
    factors = prepare_doric_factors(jnp.full((4, 5), 1e17),
                                    jnp.full((4, 5), 1e16),
                                    jnp.full((4, 5), 1e14))
    out = doric(3e11, jnp.full((4, 5), 1.1e-3), ion,
                jnp.full((4, 5), 1e-11), jnp.full((4, 5), 8e-12),
                jnp.full((4, 5), 1e-13), factors, rates)
    assert out.cur.h1.shape == (4, 5)
    assert bool(jnp.all(out.cur.h1 > 0)) and bool(jnp.all(out.cur.h1 < 1))
    # all entries identical -> uniform result
    assert float(jnp.std(out.cur.h1)) < 1e-18


def test_fraction_bounds_preserved():
    """Clamping must keep fractions in [eps, 1] and He summing to 1."""
    rates = rate_coefficients(jnp.float64(5.0e4))
    ion = make_state(1 - 1e-12, 1e-12, 1e-12)
    factors = prepare_doric_factors(jnp.float64(1e10), jnp.float64(1e10),
                                    jnp.float64(1e8))
    out = doric(1e16, jnp.float64(1.0), ion, jnp.float64(1e-8),
                jnp.float64(1e-8), jnp.float64(1e-9), factors, rates)
    for f in (out.cur.h0, out.cur.h1, out.cur.he0, out.cur.he1, out.cur.he2,
              out.avg.h0, out.avg.h1):
        v = float(f)
        assert EPS * 0.999 <= v <= 1.0
    np.testing.assert_allclose(
        float(out.cur.he0 + out.cur.he1 + out.cur.he2), 1.0, rtol=1e-12)


def test_electrondens():
    ions = ion_fractions(jnp.float64(0.5), jnp.float64(0.25), jnp.float64(0.25))
    ne = electrondens(2.0, ions)
    expected = 2.0 * (0.5 * (1 - const.abu_he) + const.abu_c
                      + const.abu_he * (0.25 + 0.5))
    np.testing.assert_allclose(float(ne), expected, rtol=1e-14)


def test_doric_float32_matches_float64():
    """f32 must not under/overflow: the cgs rate magnitudes are
    nondimensionalised inside doric (products like Qmat*aihe1 ~ 1e-46
    underflow f32 to 0 and produced inf/NaN before the rescale)."""
    rng = np.random.RandomState(3)
    n = 64
    ndens = 10.0 ** rng.uniform(-7, 2, n)
    h1 = 10.0 ** rng.uniform(-10, -0.001, n)
    he1 = 10.0 ** rng.uniform(-10, -1, n)
    he2 = 10.0 ** rng.uniform(-12, -2, n)
    photo = np.where(rng.rand(n) < 0.5, 0.0, 10.0 ** rng.uniform(-20, -8, n))
    dt = 1.0e14

    def run(dtype):
        f = IonFractions(*(jnp.asarray(a, dtype)
                           for a in (1.0 - h1, h1, 1.0 - he1 - he2, he1,
                                     he2)))
        ion = IonState(cur=f, avg=f, old=f)
        nd = jnp.asarray(ndens, dtype)
        ne = electrondens(nd, f)
        rates = rate_coefficients(jnp.asarray(np.full(n, 1.0e4), dtype))
        cch = coldens(1.0, f.h0, nd, 1.0 - const.abu_he)
        cche0 = coldens(1.0, f.he0, nd, const.abu_he)
        cche1 = coldens(1.0, f.he1, nd, const.abu_he)
        fac = prepare_doric_factors(cch, cche0, cche1)
        ph = jnp.asarray(photo, dtype)
        out = doric(jnp.asarray(dt, dtype), ne, ion, ph, 0.1 * ph, 0.01 * ph,
                    fac, rates, 1.0, EPS)
        return out

    o32 = run(jnp.float32)
    o64 = run(jnp.float64)
    for a32, a64 in zip(jax.tree_util.tree_leaves(o32),
                        jax.tree_util.tree_leaves(o64)):
        a32 = np.asarray(a32, np.float64)
        a64 = np.asarray(a64)
        assert np.all(np.isfinite(a32))
        # relative agreement where the fraction is significant; below
        # ~1e-4 the equilibrium/mode cancellations are at the f32 noise
        # floor and only absolute accuracy is meaningful
        m = a64 > 1.0e-4
        assert np.allclose(a32[m], a64[m], rtol=1.0e-2), (
            np.max(np.abs(a32[m] - a64[m]) / a64[m]))
        assert np.allclose(a32, a64, rtol=0.2, atol=1.0e-5)


def test_prepare_doric_factors_tiny_columns_f32():
    """Columns from epsilon-floored fractions at unit path underflow the
    raw tau products in f32 (1e-25 * 1e-21 -> 0, 0/0 = NaN); the
    ratio-normalised form must stay finite and match f64."""
    cases32 = []
    cases64 = []
    for dtype in (jnp.float32, jnp.float64):
        NHI = jnp.asarray([1e-25, 1e-25, 1e18, 0.0], dtype)
        NHeI = jnp.asarray([1e-26, 1e-26, 1e17, 0.0], dtype)
        NHeII = jnp.asarray([1e-26, 1e-5, 1e16, 0.0], dtype)
        (cases32 if dtype == jnp.float32 else cases64).append(
            prepare_doric_factors(NHI, NHeI, NHeII))
    f32, f64 = cases32[0], cases64[0]
    for a, b in zip(f32, f64):
        a = np.asarray(a, np.float64)
        b = np.asarray(b)
        assert np.all(np.isfinite(a[:3])) and np.all(np.isfinite(b[:3]))
        assert np.allclose(a[:3], b[:3], rtol=1e-5)


def test_global_pass_f32_neutral_start_no_nan():
    """The bench scenario that NaN'd on TPU: fully neutral f32 grid hit
    by moderate HI/HeI rates; the cell ionizes to h0 ~ epsilon within
    one doric call and the second call must survive (underflow-safe
    doric + factors)."""
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep.global_pass import (ChemistryConfig,
                                             global_chemistry_pass)
    from c2ray_tpu.sweep.source_sweep import RateGrids

    n = 8
    dtype = jnp.float32
    state = begin_timestep(initial_grid_state(
        np.full(n, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4, dtype=dtype))
    rates = RateGrids(
        phih=jnp.full(n, 1.92e-13, dtype),
        phihe0=jnp.full(n, 3.94e-13, dtype),
        phihe1=jnp.zeros(n, dtype), phiheat=jnp.zeros(n, dtype),
        photon_loss=jnp.zeros((), dtype))
    cfg = ChemistryConfig(cooling=None, isothermal=True,
                          isothermal_temperature=1.0e4)
    ns, cf = global_chemistry_pass(cfg, state, rates,
                                   jnp.asarray(1e14, dtype))
    for leaf in (ns.h_av1, ns.he_av1, ns.h_int1, ns.he_int2):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert 0.9 < float(ns.h_av1[0]) < 1.0
