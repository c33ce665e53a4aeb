"""Per-cell ionization chemistry: the `doric` analytic ODE solver.

TPU-native, fully vectorised re-implementation of
``code/doric.f90:35-313`` (the coupled H/He ionization ODE with
recombination-photon coupling), ``prepare_doric_factors``
(``code/doric.f90:317-351``), ``coldens`` (``code/doric.f90:358-372``),
boundary column densities (``code/doric.f90:377-407``) and
``electrondens`` (``code/tped.f90:75-84``).

Design: the reference solves a 3x3 linear ODE analytically per cell inside
nested scalar loops.  Here every quantity is an array of arbitrary shape
(grid, batch of cells, ...) and the solution is pure elementwise VPU math,
so one call handles the entire grid and `vmap`/`shard_map` compose freely.
"""

from typing import NamedTuple

import jax.numpy as jnp

from . import constants as const
from .rates import RateCoeffs


class IonFractions(NamedTuple):
    """Ionization fractions for one epoch (all same-shape arrays)."""

    h0: jnp.ndarray   # neutral H fraction
    h1: jnp.ndarray   # ionized H fraction
    he0: jnp.ndarray  # neutral He
    he1: jnp.ndarray  # He+
    he2: jnp.ndarray  # He++


class IonState(NamedTuple):
    """Current / time-averaged / start-of-step ionization fractions.

    Mirrors the reference `ionstates` type (mat_ini_test.F90:70-77).
    """

    cur: IonFractions
    avg: IonFractions
    old: IonFractions


def ion_fractions(h1, he1, he2) -> IonFractions:
    """Build IonFractions from the ionized fractions."""
    h1, he1, he2 = jnp.asarray(h1), jnp.asarray(he1), jnp.asarray(he2)
    return IonFractions(h0=1.0 - h1, h1=h1, he0=1.0 - he1 - he2, he1=he1, he2=he2)


def electrondens(ndens, ions: IonFractions):
    """Electron density (tped.f90:75-84)."""
    return ndens * (
        ions.h1 * (1.0 - const.abu_he)
        + const.abu_c
        + const.abu_he * (ions.he1 + 2.0 * ions.he2)
    )


def coldens(path, neufrac, ndens, abundance):
    """Column density contribution of one cell (doric.f90:358-372)."""
    return neufrac * ndens * path * abundance


def coldens_bndry_HI(boundary_tauHI=0.0):
    return boundary_tauHI / const.sigma_HI_at_ion_freq


def coldens_bndry_HeI(boundary_tauHeI=0.0):
    return boundary_tauHeI / const.sigma_HeI_at_ion_freq


def coldens_bndry_HeII(boundary_tauHeII=0.0):
    return boundary_tauHeII / const.sigma_HeII_at_ion_freq


class DoricFactors(NamedTuple):
    yfrac: jnp.ndarray
    zfrac: jnp.ndarray
    y2afrac: jnp.ndarray
    y2bfrac: jnp.ndarray


def prepare_doric_factors(NHI, NHeI, NHeII) -> DoricFactors:
    """Optical-depth ratios at the He thresholds / He+ Ly-a (doric.f90:317-351).

    The outputs are scale-invariant ratios of (column x cross-section)
    terms, so the columns are normalised by their sum first: the raw
    products underflow f32 (N ~ 1e-25 from epsilon-floored fractions at
    unit path times sigma ~ 1e-21 is 1e-46 -> 0, and 0/0 = NaN poisons
    the whole doric solve downstream).
    """
    NHI = jnp.asarray(NHI)
    tiny = jnp.finfo(jnp.result_type(NHI, jnp.float32)).tiny

    def pairnorm(*cols):
        inv = 1.0 / jnp.maximum(sum(cols), tiny)
        return [c * inv for c in cols]

    nh_a, nhe_a = pairnorm(NHI, NHeI)
    tau_H_heth = nh_a * const.sigma_H_heth
    tau_He_heth = nhe_a * const.sigma_HeI_at_ion_freq
    tau_H_heLya = nh_a * const.sigma_H_heLya
    tau_He_heLya = nhe_a * const.sigma_He_heLya
    nh_b, nhe_b, nhe2_b = pairnorm(NHI, NHeI, NHeII)
    tau_H_he2th = nh_b * const.sigma_H_he2
    tau_He_he2th = nhe_b * const.sigma_He_he2
    tau_He2_he2th = nhe2_b * const.sigma_HeII_at_ion_freq

    denom2 = tau_He2_he2th + tau_He_he2th + tau_H_he2th
    return DoricFactors(
        yfrac=tau_H_heth / (tau_H_heth + tau_He_heth),
        zfrac=tau_H_heLya / (tau_H_heLya + tau_He_heLya),
        y2afrac=tau_He2_he2th / denom2,
        y2bfrac=tau_He_he2th / denom2,
    )


def _clamp_h(h0, h1, epsilon):
    """Epsilon-clamp a (h0, h1) pair, h0 branch first (doric.f90:232-239)."""
    low0 = h0 < epsilon
    h0, h1 = jnp.where(low0, epsilon, h0), jnp.where(low0, 1.0 - epsilon, h1)
    low1 = h1 < epsilon
    h1, h0 = jnp.where(low1, epsilon, h1), jnp.where(low1, 1.0 - epsilon, h0)
    return h0, h1


def _clamp_h_avg(h0, h1, epsilon):
    """Same but h1 branch first (doric.f90:291-298)."""
    low1 = h1 < epsilon
    h1, h0 = jnp.where(low1, epsilon, h1), jnp.where(low1, 1.0 - epsilon, h0)
    low0 = h0 < epsilon
    h0, h1 = jnp.where(low0, epsilon, h0), jnp.where(low0, 1.0 - epsilon, h1)
    return h0, h1


def _clamp_he(he0, he1, he2, epsilon):
    """Clamp-and-renormalise He triplet only where needed (doric.f90:241-258)."""
    any_low = (he0 <= epsilon) | (he1 <= epsilon) | (he2 <= epsilon)
    c0 = jnp.maximum(he0, epsilon)
    c1 = jnp.maximum(he1, epsilon)
    c2 = jnp.maximum(he2, epsilon)
    norm = c0 + c1 + c2
    he0 = jnp.where(any_low, c0 / norm, he0)
    he1 = jnp.where(any_low, c1 / norm, he1)
    he2 = jnp.where(any_low, c2 / norm, he2)
    return he0, he1, he2


def doric(
    dt,
    ne,
    ion: IonState,
    photo_HI,
    photo_HeI,
    photo_HeII,
    factors: DoricFactors,
    rates: RateCoeffs,
    clumping=1.0,
    epsilon=1.0e-20,
) -> IonState:
    """Analytic one-step solution of the coupled H/He ionization ODE.

    Re-derivation of ``code/doric.f90:35-313``: solve
    d/dt (x_HII, x_HeII, x_HeIII) = M x + g over ``dt`` via the
    eigen-decomposition of the (upper-triangular-coupled) matrix M, with
    recombination-photon coupling encoded through the Osterbrock /
    Flower & Perinotto p/f/w/y/z fractions.  Also produces the
    time-averaged fractions via (e^{lam dt}-1)/(lam dt) factors.

    All inputs broadcast elementwise; `photo_*` are per-atom
    photo-ionization rates [1/s]; `ne` is the electron density.
    Returns a new IonState with updated ``cur`` and ``avg`` (``old`` is
    passed through).
    """
    pfrac = 0.96  # Osterbrock 1989
    heliumfraction = const.abu_he / (1.0 - const.abu_he)
    ffrac = jnp.clip(10.0 * ion.cur.h0, 0.01, 1.0)
    yfrac, zfrac = factors.yfrac, factors.zfrac
    y2afrac, y2bfrac = factors.y2afrac, factors.y2bfrac
    # Flower & Perinotto (1980)
    wfrac = (1.425 - 0.737) + 0.737 * yfrac
    v = rates.v

    alpha_h_B = clumping * rates.brech0
    alpha_h_A = clumping * rates.arech0
    alpha_he_1 = clumping * rates.oreche0
    alpha_he_B = clumping * rates.breche0
    alpha_he_A = clumping * rates.areche0
    alpha_he2_B = clumping * rates.breche1
    alpha_he2_A = clumping * rates.areche1
    alpha_he2_2 = clumping * rates.treche1
    alpha_he2_1 = alpha_he2_A - alpha_he2_B

    # floor equivalent to the reference's 1e-200 (doric.f90:109-111),
    # but representable at the working precision
    tiny = jnp.finfo(jnp.result_type(photo_HI, ne)).tiny
    aih0 = jnp.maximum(photo_HI + ne * rates.colli_HI, tiny)
    aihe0 = jnp.maximum(photo_HeI + ne * rates.colli_HeI, tiny)
    aihe1 = jnp.maximum(photo_HeII + ne * rates.colli_HeII, tiny)

    # --- two-sector nondimensionalisation.  The solution depends only
    # on rate *ratios* and lambda*dt, but the raw magnitudes (cgs rates
    # ~1e-30..1e+12 /s across a grid: think a shielded He sector next to
    # a per-neutral-atom H rate divided by x_HI ~ epsilon) make products
    # like Qmat*aihe1 or Emat*Pmat underflow f32 and NaN the algebra.
    # A single shared scale is not enough -- the H and He sectors can be
    # 30+ decades apart and their cross products still underflow -- so
    # the He-sector rates (E, P, Q, M, N, aihe0/1) are scaled by `sHe`
    # and the H rate by `sH`, and every downstream expression is built
    # from (a) products of same-sector scaled O(<=1) values, (b) raw
    # differences of representable rates, (c) explicit scale *ratios*
    # (sHe/sH underflowing gracefully to 0 where the coupling is
    # physically nil).  f64 results are unchanged up to rounding.
    sH = aih0 + ne * alpha_h_B                     # = -Lmat
    sHe = aihe0 + aihe1 + ne * (alpha_he_A + alpha_he2_A)
    a0 = aihe0 / sHe
    a1 = aihe1 / sHe
    nes = ne / sHe

    # Matrix elements (doric.f90:124-131); tilde = He-sector scaled
    Lmat = -sH
    Mt = (yfrac * nes * alpha_he_1 + pfrac * nes * alpha_he_B) \
        * heliumfraction
    Nt = (
        (ffrac * zfrac * (1.0 - v) + v * wfrac) * alpha_he2_B
        + alpha_he2_2
        + (1.0 - y2afrac - y2bfrac) * alpha_he2_1
    ) * heliumfraction * nes
    Pt = -a0 - a1 - nes * (alpha_he_A - (1.0 - yfrac) * alpha_he_1)
    Et = -nes * (alpha_he2_A - y2afrac * alpha_he2_1)
    Qt = (
        -a0
        + nes * alpha_he2_B * (ffrac * (1.0 - zfrac) * (1.0 - v)
                               + v * (1.425 - wfrac))
        - Et
        + alpha_he2_1 * y2bfrac * nes
    )

    Bt = Et - Pt
    four_aQ = 4.0 * a1 * Qt
    St = jnp.sqrt(Bt * Bt + four_aQ)
    QHEPt = 1.0 / (Qt * a1 - Et * Pt)
    # B -+ S with the quadratic-root product identity for the
    # cancelling branch ((B-S)(B+S) = -4*a1*Qt): the direct difference
    # loses all significant digits when |4aQ| << B^2, which is the
    # common regime (He+ ionization rate tiny); the reference computes
    # it naively in f64 (doric.f90:163-166) at ~1e-5 accuracy,
    # unacceptable in f32.
    big = jnp.where(Bt >= 0.0, Bt + St, Bt - St)
    small = -four_aQ / jnp.where(jnp.abs(big) > tiny, big, tiny)
    BmSt = jnp.where(Bt >= 0.0, small, big)
    BpSt = jnp.where(Bt >= 0.0, big, small)

    # Eigenvalues (doric.f90:168-170); lambda2/3 back in raw units
    lambda1 = Lmat
    lambda2 = 0.5 * sHe * (Et + Pt - St)
    lambda3 = 0.5 * sHe * (Et + Pt + St)

    # Particular solution (doric.f90:176-178).  rx's He->H coupling term
    # carries one explicit sHe/sH ratio; ry/rz are pure He-sector ratios
    rx = aih0 / sH + (sHe / sH) * ((Mt * Et - Nt * a1) * (a0 * QHEPt))
    ry = a0 * (Et * QHEPt)
    rz = -a0 * (a1 * QHEPt)

    # --- mode coefficients per species.  The reference parameterises the
    # eigenvectors with 1/(2*aihe1) factors (doric.f90:184-212) and then
    # multiplies them back into coefficients proportional to aihe1; when
    # the He+ ionization rate is tiny that huge*tiny product destroys
    # f32 (and costs digits even in f64).  The aihe1 factors cancel
    # analytically (via BplusS*BminusS = -4*aihe1*Qmat), so we build the
    # products (coefK * eigvK_species) directly in cancelled form:
    #   h1(t)  = coef1 e^{l1 t} + X2 e^{l2 t} + X3 e^{l3 t} + rx
    #   he1(t) =                  Y2 e^{l2 t} + Y3 e^{l3 t} + ry
    #   he2(t) =                  Z2 e^{l2 t} + Z3 e^{l3 t} + rz
    dy = ry - ion.old.he1
    Tz = rz - ion.old.he2
    twoS = 2.0 * jnp.maximum(St, tiny)
    Lm2 = Lmat - lambda2
    Lm3 = Lmat - lambda3
    # He->H mode couplings: one explicit scale ratio sHe/(L-lambda)
    # each (underflows gracefully to 0 when H evolves vastly faster)
    r2 = sHe / jnp.where(Lm2 == 0.0, -tiny, Lm2)
    r3 = sHe / jnp.where(Lm3 == 0.0, -tiny, Lm3)
    u2 = -2.0 * a1 * Nt + Mt * BpSt
    u3 = -2.0 * a1 * Nt + Mt * BmSt
    w2 = Nt * BmSt + 2.0 * Qt * Mt
    w3 = Nt * BpSt + 2.0 * Qt * Mt
    X2 = (u2 * dy - w2 * Tz) * r2 / twoS
    X3 = (-u3 * dy + w3 * Tz) * r3 / twoS
    Y2 = -(BpSt * dy - 2.0 * Qt * Tz) / twoS
    Y3 = (BmSt * dy - 2.0 * Qt * Tz) / twoS
    Z2 = (2.0 * a1 * dy + BmSt * Tz) / twoS
    Z3 = -(2.0 * a1 * dy + BpSt * Tz) / twoS
    coef1 = ion.old.h1 - rx - X2 - X3

    lam1dt = dt * lambda1
    lam2dt = dt * lambda2
    lam3dt = dt * lambda3
    elam1dt = jnp.exp(lam1dt)
    elam2dt = jnp.exp(lam2dt)
    elam3dt = jnp.exp(lam3dt)

    h1 = coef1 * elam1dt + X2 * elam2dt + X3 * elam3dt + rx
    he1 = Y2 * elam2dt + Y3 * elam3dt + ry
    he2 = Z2 * elam2dt + Z3 * elam3dt + rz
    h0 = 1.0 - h1
    he0 = 1.0 - he1 - he2

    h0, h1 = _clamp_h(h0, h1, epsilon)
    he0, he1, he2 = _clamp_he(he0, he1, he2, epsilon)

    # Time-averaged fractions; guard (e^x - 1)/x for small |x|
    # (doric.f90:267-283)
    # (e^{x}-1)/x via expm1: the reference's (elamdt-1.0)/lamdt with a
    # 1e-8 small-|x| cutoff (doric.f90:267-283) loses all digits for
    # |x| in [eps, ~1e-3] at working precision; expm1 has no
    # cancellation at any x, so only exact zero needs a branch
    def em1_over(lamdt):
        safe = jnp.where(lamdt == 0.0, 1.0, lamdt)
        return jnp.where(lamdt == 0.0, 1.0, jnp.expm1(safe) / safe)

    f1 = em1_over(lam1dt)
    f2 = em1_over(lam2dt)
    f3 = em1_over(lam3dt)

    h1_av = rx + coef1 * f1 + X2 * f2 + X3 * f3
    he1_av = ry + Y2 * f2 + Y3 * f3
    he2_av = rz + Z2 * f2 + Z3 * f3
    h0_av = 1.0 - h1_av
    he0_av = 1.0 - he1_av - he2_av

    h0_av, h1_av = _clamp_h_avg(h0_av, h1_av, epsilon)
    he0_av, he1_av, he2_av = _clamp_he(he0_av, he1_av, he2_av, epsilon)

    return IonState(
        cur=IonFractions(h0=h0, h1=h1, he0=he0, he1=he1, he2=he2),
        avg=IonFractions(h0=h0_av, h1=h1_av, he0=he0_av, he1=he1_av, he2=he2_av),
        old=ion.old,
    )
