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
    """Optical-depth ratios at the He thresholds / He+ Ly-a (doric.f90:317-351)."""
    tau_H_heth = NHI * const.sigma_H_heth
    tau_He_heth = NHeI * const.sigma_HeI_at_ion_freq
    tau_H_heLya = NHI * const.sigma_H_heLya
    tau_He_heLya = NHeI * const.sigma_He_heLya
    tau_H_he2th = NHI * const.sigma_H_he2
    tau_He_he2th = NHeI * const.sigma_He_he2
    tau_He2_he2th = NHeII * const.sigma_HeII_at_ion_freq

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

    # Matrix elements (doric.f90:124-131)
    Lmat = -(aih0 + ne * alpha_h_B)
    Mmat = (yfrac * ne * alpha_he_1 + pfrac * ne * alpha_he_B) * heliumfraction
    Nmat = (
        (ffrac * zfrac * (1.0 - v) + v * wfrac) * alpha_he2_B
        + alpha_he2_2
        + (1.0 - y2afrac - y2bfrac) * alpha_he2_1
    ) * heliumfraction * ne
    Pmat = -aihe0 - aihe1 - ne * (alpha_he_A - (1.0 - yfrac) * alpha_he_1)
    Emat = -ne * (alpha_he2_A - y2afrac * alpha_he2_1)
    Qmat = (
        -aihe0
        + ne * alpha_he2_B * (ffrac * (1.0 - zfrac) * (1.0 - v) + v * (1.425 - wfrac))
        - Emat
        + alpha_he2_1 * y2bfrac * ne
    )

    Bcoef = Emat - Pmat
    Scoef = jnp.sqrt(Bcoef * Bcoef + 4.0 * aihe1 * Qmat)
    QHEPcoef = 1.0 / (Qmat * aihe1 - Emat * Pmat)
    BminusS = Bcoef - Scoef
    BplusS = Bcoef + Scoef

    # Eigenvalues (doric.f90:168-170)
    lambda1 = Lmat
    lambda2 = 0.5 * (Emat + Pmat - Scoef)
    lambda3 = 0.5 * (Emat + Pmat + Scoef)

    # Particular solution (doric.f90:176-178)
    rx = -1.0 / Lmat * (aih0 + (Mmat * Emat - Nmat * aihe1) * (aihe0 * QHEPcoef))
    ry = aihe0 * (Emat * QHEPcoef)
    rz = -aihe0 * (aihe1 * QHEPcoef)

    twoaihe1 = 2.0 * aihe1
    eigv2x = -Nmat / (Lmat - lambda2) + (Mmat / twoaihe1) * BplusS / (Lmat - lambda2)
    eigv3x = (-twoaihe1 * Nmat + Mmat * BminusS) / (twoaihe1 * (Lmat - lambda3))
    eigv2y = (-BplusS) / twoaihe1
    eigv3y = (-BminusS) / twoaihe1

    Rcoef = twoaihe1 * (ry - ion.old.he1)
    Tcoef = rz - ion.old.he2

    coef2 = (Rcoef + BminusS * Tcoef) / (2.0 * Scoef)
    coef3 = -(Rcoef + BplusS * Tcoef) / (2.0 * Scoef)
    coef1 = (
        -rx
        + (eigv3x - eigv2x) * (Rcoef / (2.0 * Scoef))
        + Tcoef
        * (BplusS * eigv3x / (2.0 * Scoef) - BminusS * eigv2x / (2.0 * Scoef))
        + ion.old.h1
    )

    lam1dt = dt * lambda1
    lam2dt = dt * lambda2
    lam3dt = dt * lambda3
    elam1dt = jnp.exp(lam1dt)
    elam2dt = jnp.exp(lam2dt)
    elam3dt = jnp.exp(lam3dt)

    h1 = coef1 * elam1dt + coef2 * elam2dt * eigv2x + coef3 * elam3dt * eigv3x + rx
    he1 = coef2 * elam2dt * eigv2y + coef3 * elam3dt * eigv3y + ry
    he2 = coef2 * elam2dt + coef3 * elam3dt + rz
    h0 = 1.0 - h1
    he0 = 1.0 - he1 - he2

    h0, h1 = _clamp_h(h0, h1, epsilon)
    he0, he1, he2 = _clamp_he(he0, he1, he2, epsilon)

    # Time-averaged fractions; guard (e^x - 1)/x for small |x|
    # (doric.f90:267-283)
    def avg_factor(coef, lamdt, elamdt):
        small = jnp.abs(lamdt) < 1.0e-8
        safe = jnp.where(small, 1.0, lamdt)
        return jnp.where(small, coef, coef * (elamdt - 1.0) / safe)

    af1 = avg_factor(coef1, lam1dt, elam1dt)
    af2 = avg_factor(coef2, lam2dt, elam2dt)
    af3 = avg_factor(coef3, lam3dt, elam3dt)

    h1_av = rx + af1 + eigv2x * af2 + eigv3x * af3
    he1_av = ry + eigv2y * af2 + eigv3y * af3
    he2_av = rz + af2 + af3
    h0_av = 1.0 - h1_av
    he0_av = 1.0 - he1_av - he2_av

    h0_av, h1_av = _clamp_h_avg(h0_av, h1_av, epsilon)
    he0_av, he1_av, he2_av = _clamp_he(he0_av, he1_av, he2_av, epsilon)

    return IonState(
        cur=IonFractions(h0=h0, h1=h1, he0=he0, he1=he1, he2=he2),
        avg=IonFractions(h0=h0_av, h1=h1_av, he0=he0_av, he1=he1_av, he2=he2_av),
        old=ion.old,
    )
