"""Gather-free photo-ionization rates via exponential-sum quadrature.

TPU-native replacement for the tau-table lookup of
``radiation_photoionrates.f90``: instead of interpolating precomputed
Romberg tables (random gathers from a (2001, nbands) table are the
dominant cost on TPU -- ~21 ms per 2.3M-element gather), evaluate the
band integral directly with Gauss-Legendre quadrature:

    G_b(tau)      = int SED(nu) e^{-tau sighat(nu)} dnu
                  ~ sum_k A_{bk} e^{-tau sighat_{bk}}
    Gthin_b(tau)  ~ sum_k A_{bk} sighat_{bk} e^{-tau sighat_{bk}}
    H_{b,s}(tau)  ~ sum_k A_{bk} h(nu_k - nu_s) e^{-tau sighat_{bk}}

with sighat(nu) = (nu/nu_min)^{-pli_b}, exactly the reference's
integrand (radiation_tables.f90:593-783).  A K-node rule per sub-band
is spectrally accurate for these smooth narrow-band integrands (K=16
default beats the 2000-row table's linear interpolation error), and the
runtime cost is K exponentials per (cell, band) on the VPU -- no memory
traffic at all.

The same attenuation factors e^{-tau sighat_k} serve the photo rate,
the thin variant and all three heating species, so they are computed
once per optical-depth set.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .. import constants as const
from .bands import Bands, make_bands
from .photo import (PhotRates, TAU_HEAT_LIMIT, TAU_PHOTO_LIMIT, _AR2, _BR1,
                    _BR2, _CR1, _CR2, _DR1, zero_photrates)
from .sed import (SEDConfig, blackbody_photon_density, normalize_seds,
                  powerlaw_photon_density)

# 8 Gauss-Legendre nodes per sub-band: max relative rate error ~2e-8 vs
# a 64-node reference across tau in [1e-8, 1e7] -- below f32 resolution
# and far below the reference table's linear-interpolation error, at
# half the exp cost of 16 nodes (the sweep's dominant VPU work).
#
# Round-3 on-chip A/B at 128^3 x 8 sources: fixed 8 nodes sustains
# 68.7M cell-source-updates/s; the "auto" error-budgeted band blocks,
# despite ~52% fewer exp terms, reach only 30.7M -- the non-uniform
# block structure defeats XLA's single fused exp/FMA pipeline that the
# uniform (nlive, K) layout gets.  Fewer FLOPs lost to worse
# vectorization: the fixed rule is the default; "auto" remains
# available and accuracy-pinned (tests/test_quadrature_pin.py).
# Fixed Gauss-Legendre nodes per band.  6 nodes reproduce the dense
# 48-node band integrals to 3.7e-6 max relative error over tau in
# [1e-8, 1e7] (tests/test_quadrature_pin.py::test_default_rule_... and
# tools/roofline_sweep.py) -- far below the reference tau-table's own
# interpolation error -- while cutting the sweep's exp terms 25%
# vs the round-1..4 8-node rule (128^3 iso sweep 0.203 -> 0.173 s,
# heating 0.493 -> 0.369 s on v5e).
DEFAULT_NODES = 6

# error budget for the "auto" per-band node counts: max relative error
# of the band photon/heat integrals vs a 48-node reference, over
# tau in [1e-8, 1e7].  1e-6 sits below f32 resolution of the summed
# rate and far below the reference table's interpolation error.
AUTO_NODE_TOL = 1.0e-6


class SourceQuad(NamedTuple):
    """Quadrature data for one source type, shapes (nlive, K).

    Only the *live* band range [band_lo, band_hi] of this source type is
    stored (the reference determines usable ranges per type,
    radiation_tables.f90:194-256); runtime work scales with live bands
    only -- e.g. a 5e4 K blackbody keeps ~29 of the 47 sub-bands.
    """

    band_lo: int             # static python ints (trace-time slicing)
    band_hi: int
    sigma_hat: jnp.ndarray   # attenuation exponents (nu/nu_min)^-pli
    A_photo: jnp.ndarray     # photon-rate coefficients (scaled)
    A_heat_HI: Optional[jnp.ndarray]
    A_heat_HeI: Optional[jnp.ndarray]
    A_heat_HeII: Optional[jnp.ndarray]


class QuadTables(NamedTuple):
    """Everything the gather-free rate evaluation needs."""

    bb: Optional[SourceQuad]
    pl: Optional[SourceQuad]
    qso: Optional[SourceQuad]
    sigma_HI: jnp.ndarray
    sigma_HeI: jnp.ndarray
    sigma_HeII: jnp.ndarray
    f1ion_HI: jnp.ndarray
    f1ion_HeI: jnp.ndarray
    f1ion_HeII: jnp.ndarray
    f2ion_HI: jnp.ndarray
    f2ion_HeI: jnp.ndarray
    f2ion_HeII: jnp.ndarray
    f1heat_HI: jnp.ndarray
    f1heat_HeI: jnp.ndarray
    f1heat_HeII: jnp.ndarray
    f2heat_HI: jnp.ndarray
    f2heat_HeI: jnp.ndarray
    f2heat_HeII: jnp.ndarray
    mask_HeI: jnp.ndarray
    mask_HeII: jnp.ndarray


def _band_quadrature(bands: Bands, sed_fn, band_lo, band_hi, isothermal,
                     n_nodes, dtype):
    nb = bands.nbands
    K = n_nodes
    xk, wk = np.polynomial.legendre.leggauss(K)

    sigma_hat = np.zeros((nb, K))
    A_photo = np.zeros((nb, K))
    A_heat = None if isothermal else np.zeros((3, nb, K))
    thresholds = (const.ion_freq_HI, const.ion_freq_HeI, const.ion_freq_HeII)

    for b in range(nb):
        if b < band_lo or b > band_hi:
            # dead band for this source type: dropped by the slice below
            sigma_hat[b] = 1.0
            continue
        lo, hi = bands.freq_min[b], bands.freq_max[b]
        nu = 0.5 * (hi - lo) * xk + 0.5 * (hi + lo)
        w = 0.5 * (hi - lo) * wk
        if b < bands.nbnd1:
            pli = bands.pli_HI[b]
            species = (0,)
        elif b < bands.nbnd1 + bands.nbnd2:
            pli = bands.pli_HeI[b]
            species = (0, 1)
        else:
            pli = bands.pli_HeII[b]
            species = (0, 1, 2)
        sigma_hat[b] = (nu / lo) ** (-pli)
        A_photo[b] = w * sed_fn(nu)
        if A_heat is not None:
            for s in species:
                A_heat[s, b] = A_photo[b] * const.hplanck * (
                    nu - thresholds[s])

    lo_b, hi_b = int(band_lo), int(min(band_hi, nb - 1))
    sl = slice(lo_b, hi_b + 1)
    to = lambda a: jnp.asarray(a[sl], dtype=dtype)
    return SourceQuad(
        band_lo=lo_b, band_hi=hi_b,
        sigma_hat=to(sigma_hat),
        A_photo=to(A_photo),
        A_heat_HI=None if A_heat is None else to(A_heat[0]),
        A_heat_HeI=None if A_heat is None else to(A_heat[1]),
        A_heat_HeII=None if A_heat is None else to(A_heat[2]),
    )


def _band_node_data(bands, b):
    lo, hi = bands.freq_min[b], bands.freq_max[b]
    if b < bands.nbnd1:
        pli = bands.pli_HI[b]
        species = (0,)
    elif b < bands.nbnd1 + bands.nbnd2:
        pli = bands.pli_HeI[b]
        species = (0, 1)
    else:
        pli = bands.pli_HeII[b]
        species = (0, 1, 2)
    return lo, hi, pli, species


def _band_nodes_auto(bands, sed_fn, b, tol):
    """Smallest Gauss-Legendre count whose band photon/thin/heat
    integrals match a 48-node reference within `tol` over
    tau in [1e-8, 1e7] (error-budgeted node reduction)."""
    lo, hi, pli, _ = _band_node_data(bands, b)
    taus = np.logspace(-8.0, 7.0, 40)

    def integrals(K):
        xk, wk = np.polynomial.legendre.leggauss(K)
        nu = 0.5 * (hi - lo) * xk + 0.5 * (hi + lo)
        w = 0.5 * (hi - lo) * wk
        sh = (nu / lo) ** (-pli)
        A = w * sed_fn(nu)
        E = np.exp(-np.minimum(taus[:, None] * sh[None, :], 80.0))
        G = (A * E).sum(1)
        Gt = (A * sh * E).sum(1)
        H = (A * (nu - lo) * E).sum(1)
        return G, Gt, H

    ref = integrals(48)
    for k in (2, 3, 4, 5, 6, 8, 12, 16, 24, 32):
        got = integrals(k)
        ok = True
        for g, r in zip(got, ref):
            scale = np.abs(r).max()
            if scale == 0.0:
                continue
            m = np.abs(r) > scale * 1e-12
            if m.any() and np.max(
                    np.abs(g[m] - r[m]) / np.abs(r[m])) >= tol:
                ok = False
                break
        if ok:
            return k
    return 48


def _band_quadrature_blocks(bands: Bands, sed_fn, band_lo, band_hi,
                            isothermal, tol, dtype):
    """Error-budgeted adaptive node counts, as a tuple of uniform-K
    band blocks.

    The exp count is the sweep's VPU roof; narrow He sub-bands need 3
    Gauss-Legendre nodes where the wide HI band needs 12 (offline
    budget vs a 48-node reference), cutting the work ~2x vs the fixed
    8-node rule.  Bands are grouped into contiguous runs of equal K so
    each block keeps the dense (nb_block, K) layout whose
    exp->multiply->sum chain XLA fuses into one VPU pass (a flattened
    term axis with a segment-sum matmul measured ~2.4x SLOWER: the
    matmul broke the fusion and materialized the term tensors).
    """
    nb = bands.nbands
    lo_b, hi_b = int(band_lo), int(min(band_hi, nb - 1))
    ks = [_band_nodes_auto(bands, sed_fn, b, tol)
          for b in range(lo_b, hi_b + 1)]
    blocks = []
    start = lo_b
    for i in range(1, len(ks) + 1):
        if i == len(ks) or ks[i] != ks[i - 1]:
            blocks.append((start, lo_b + i - 1, ks[i - 1]))
            start = lo_b + i
    # merge single-band runs into the cheaper adjacent run to bound the
    # block count (each block is one fused XLA region)
    merged = []
    for blo, bhi, k in blocks:
        if merged and (bhi - blo < 1 or merged[-1][1] - merged[-1][0] < 1):
            plo, phi_, pk = merged[-1]
            cost_sep = (phi_ - plo + 1) * pk + (bhi - blo + 1) * k
            kM = max(pk, k)
            cost_merged = (bhi - plo + 1) * kM
            if cost_merged <= 1.25 * cost_sep:
                merged[-1] = (plo, bhi, kM)
                continue
        merged.append((blo, bhi, k))
    return tuple(_band_quadrature(bands, sed_fn, blo, bhi, isothermal,
                                  k, dtype)
                 for blo, bhi, k in merged)


def build_quadrature_tables(sed: SEDConfig, bands: Optional[Bands] = None, *,
                            isothermal=False, dtype=jnp.float32,
                            n_nodes: int = DEFAULT_NODES,
                            flux_scale: Optional[float] = None):
    """Quadrature analog of `build_radiation_tables`.

    Returns (QuadTables, normalized SEDConfig, Bands-with-flux_scale).
    """
    from .tables import _bb_band_limits, _pl_band_limits

    if bands is None:
        bands = make_bands()
    # canonicalize to the dtype the backend actually delivers: on TPU
    # without x64, a requested float64 silently truncates to float32,
    # and unscaled photon-rate tables (~1e49) would overflow to inf
    dtype = jnp.empty((), dtype).dtype
    sed = normalize_seds(sed, bands.freq_min[0], bands.freq_max[-1],
                         edges=bands.freq_max[:-1])
    if flux_scale is None:
        if dtype == jnp.float64:
            flux_scale = 1.0
        else:
            flux_scale = sum(s.S_star for s in (sed.bb, sed.pl, sed.qso)
                             if s is not None)
    inv = 1.0 / flux_scale

    if n_nodes == "auto":
        build = lambda fn, lo, hi: _band_quadrature_blocks(
            bands, fn, lo, hi, isothermal, AUTO_NODE_TOL, dtype)
    else:
        build = lambda fn, lo, hi: _band_quadrature(
            bands, fn, lo, hi, isothermal, n_nodes, dtype)

    bb = pl = qso = None
    if sed.bb is not None:
        lo, hi = _bb_band_limits(bands, sed.bb.h_over_kT)
        R2 = sed.bb.R_star**2
        bb = build(
            lambda f: inv * 4.0 * const.pi * R2
            * blackbody_photon_density(f, sed.bb.h_over_kT), lo, hi)
    if sed.pl is not None:
        lo, hi = _pl_band_limits(bands, sed.pl.min_freq, sed.pl.max_freq)
        pl = build(
            lambda f: inv * sed.pl.scaling
            * powerlaw_photon_density(f, sed.pl.index), lo, hi)
    if sed.qso is not None:
        lo, hi = _pl_band_limits(bands, sed.qso.min_freq, sed.qso.max_freq)
        qso = build(
            lambda f: inv * sed.qso.scaling
            * powerlaw_photon_density(f, sed.qso.index), lo, hi)

    nb = bands.nbands
    n1, n2 = bands.nbnd1, bands.nbnd2
    zeros = np.zeros(nb)
    f = {name: getattr(bands, name) if getattr(bands, name) is not None
         else zeros
         for name in ("f1ion_HI", "f1ion_HeI", "f1ion_HeII",
                      "f2ion_HI", "f2ion_HeI", "f2ion_HeII",
                      "f1heat_HI", "f1heat_HeI", "f1heat_HeII",
                      "f2heat_HI", "f2heat_HeI", "f2heat_HeII")}
    arr = lambda a: jnp.asarray(a, dtype=dtype)
    qt = QuadTables(
        bb=bb, pl=pl, qso=qso,
        sigma_HI=arr(bands.sigma_HI), sigma_HeI=arr(bands.sigma_HeI),
        sigma_HeII=arr(bands.sigma_HeII),
        mask_HeI=arr((np.arange(nb) >= n1).astype(float)),
        mask_HeII=arr((np.arange(nb) >= n1 + n2).astype(float)),
        **{k: arr(v) for k, v in f.items()},
    )
    import dataclasses
    bands = dataclasses.replace(bands, flux_scale=float(flux_scale))
    return qt, sed, bands


def _attenuation(sq: SourceQuad, tau):
    """e^{-tau sighat_k}: tau (..., nb) -> (..., nb, K)."""
    expo = tau[..., None] * sq.sigma_hat
    return jnp.exp(-jnp.minimum(expo, 80.0))


def _one_source_quad(qt: QuadTables, sq: SourceQuad, nflux,
                     cd_in_HI, cd_out_HI, cd_in_HeI, cd_out_HeI,
                     cd_in_HeII, cd_out_HeII,
                     vol, i_state, do_heating,
                     track_bands=False) -> PhotRates:
    """Photo + heating rates for one source type (quadrature path).

    Optical depths and species scalings are computed here, directly on
    this source type's *live* band range (sigma vectors sliced at trace
    time), so every per-cell array has width nlive <= nbands and the
    exp/sum work scales with live bands only
    (radiation_tables.f90:194-256 determines the usable ranges).
    """
    sl = slice(sq.band_lo, sq.band_hi + 1)
    dtype = cd_in_HI.dtype
    sig_HI = qt.sigma_HI[sl]
    sig_HeI = qt.sigma_HeI[sl]
    sig_HeII = qt.sigma_HeII[sl]
    mask_HeI = qt.mask_HeI[sl]
    mask_HeII = qt.mask_HeII[sl]

    tau_in = (cd_in_HI[..., None] * sig_HI
              + cd_in_HeI[..., None] * sig_HeI
              + cd_in_HeII[..., None] * sig_HeII)
    tau_out = (cd_out_HI[..., None] * sig_HI
               + cd_out_HeI[..., None] * sig_HeI
               + cd_out_HeII[..., None] * sig_HeII)

    # per-species cell optical depths and the tau-weighted split of the
    # band rate between species (scale_int2/3, radiation_photoionrates.
    # f90:787-823)
    tau_cell_HI = sig_HI * (cd_out_HI - cd_in_HI)[..., None]
    tau_cell_HeI = sig_HeI * (cd_out_HeI - cd_in_HeI)[..., None]
    tau_cell_HeII = sig_HeII * (cd_out_HeII - cd_in_HeII)[..., None]
    denom = tau_cell_HI + tau_cell_HeI + tau_cell_HeII
    inv = 1.0 / jnp.maximum(denom, jnp.finfo(dtype).tiny)
    scaling_HI = tau_cell_HI * inv
    scaling_HeI = tau_cell_HeI * inv
    scaling_HeII = tau_cell_HeII * inv

    nfl = nflux[..., None]
    volk = vol[..., None]
    E_in = _attenuation(sq, tau_in)     # (..., nlive, K)
    E_out = _attenuation(sq, tau_out)
    dtau = tau_out - tau_in

    phi_in = nfl * (sq.A_photo * E_in).sum(-1)
    thick = jnp.abs(dtau) > TAU_PHOTO_LIMIT
    phi_all_thick = nfl * (sq.A_photo * (E_in - E_out)).sum(-1)
    phi_all_thin = nfl * dtau * (sq.A_photo * sq.sigma_hat * E_in).sum(-1)
    phi_all = jnp.where(thick, phi_all_thick, phi_all_thin)
    phi_out = phi_in - phi_all

    photo_cell_HI = (scaling_HI * phi_all / volk).sum(-1)
    photo_cell_HeI = (mask_HeI * scaling_HeI * phi_all / volk).sum(-1)
    photo_cell_HeII = (mask_HeII * scaling_HeII * phi_all / volk).sum(-1)

    z = jnp.zeros_like(photo_cell_HI)
    if track_bands:
        # pad this source type's live slice into the full 47-band axis
        nb_all = qt.sigma_HI.shape[0]
        pob = jnp.zeros(phi_out.shape[:-1] + (nb_all,),
                        dtype=dtype).at[..., sl].add(phi_out)
    else:
        pob = jnp.zeros((), dtype=dtype)
    out = PhotRates(
        photo_cell_HI=photo_cell_HI, photo_cell_HeI=photo_cell_HeI,
        photo_cell_HeII=photo_cell_HeII, heat=z,
        photo_in=phi_in.sum(-1), photo_out=phi_out.sum(-1),
        photo_out_bands=pob)

    if not do_heating or sq.A_heat_HI is None:
        return out

    hthick = jnp.abs(dtau) > TAU_HEAT_LIMIT

    def species_heat(A, tau_cell, scaling, mask):
        ph_thick = scaling * nfl * (A * (E_in - E_out)).sum(-1) / volk
        ph_thin = nfl * tau_cell * (A * sq.sigma_hat * E_in).sum(-1) / volk
        return mask * jnp.where(hthick, ph_thick, ph_thin)

    one = jnp.ones_like(mask_HeI)
    ph_HI = species_heat(sq.A_heat_HI, tau_cell_HI, scaling_HI, one)
    ph_HeI = species_heat(sq.A_heat_HeI, tau_cell_HeI, scaling_HeI,
                          mask_HeI)
    ph_HeII = species_heat(sq.A_heat_HeII, tau_cell_HeII, scaling_HeII,
                           mask_HeII)

    df_heat = ph_HI + ph_HeI + ph_HeII
    x = i_state[..., None]

    def y1R(i):
        return _CR1[i] * (1.0 - x ** _BR1[i]) ** _DR1[i]

    def y2R(i):
        xeb = 1.0 - x ** _BR2[i]
        return _CR2[i] * x ** _AR2[i] * xeb * xeb

    fra1 = (qt.f1ion_HI[sl] * ph_HI + qt.f1ion_HeI[sl] * ph_HeI
            + qt.f1ion_HeII[sl] * ph_HeII)
    fra2 = (qt.f2ion_HI[sl] * ph_HI + qt.f2ion_HeI[sl] * ph_HeI
            + qt.f2ion_HeII[sl] * ph_HeII)
    fra3 = (qt.f1heat_HI[sl] * ph_HI + qt.f1heat_HeI[sl] * ph_HeI
            + qt.f1heat_HeII[sl] * ph_HeII)
    fra4 = (qt.f2heat_HI[sl] * ph_HI + qt.f2heat_HeI[sl] * ph_HeI
            + qt.f2heat_HeII[sl] * ph_HeII)

    f_heat = (df_heat - y1R(2) * fra3 + y2R(2) * fra4).sum(-1)
    f_ion_HI = (y1R(0) * fra1 - y2R(0) * fra2).sum(-1)
    f_ion_HeI = (y1R(1) * fra1 - y2R(1) * fra2).sum(-1)

    return PhotRates(
        photo_cell_HI=out.photo_cell_HI
        + f_ion_HI / (const.ion_freq_HI * const.hplanck),
        photo_cell_HeI=out.photo_cell_HeI
        + f_ion_HeI / (const.ion_freq_HeI * const.hplanck),
        photo_cell_HeII=out.photo_cell_HeII,
        heat=f_heat,
        photo_in=out.photo_in, photo_out=out.photo_out,
        photo_out_bands=out.photo_out_bands)


def photoion_rates_quad(
    qt: QuadTables,
    colum_in_HI, colum_out_HI,
    colum_in_HeI, colum_out_HeI,
    colum_in_HeII, colum_out_HeII,
    vol,
    i_state,
    nflux_bb=None,
    nflux_pl=None,
    nflux_qso=None,
    do_heating: bool = True,
    track_bands: bool = False,
) -> PhotRates:
    """Drop-in quadrature version of `photoion_rates` (same contract).

    `track_bands` also fills PhotRates.photo_out_bands, the outgoing
    photon rate resolved over the full band axis -- the input the
    47-band-correct photon-loss redistribution needs
    (distribute_photon_losses; the reference's disabled 7-band hook is
    evolve_point.F90:654-731)."""
    cd_in_HI = jnp.asarray(colum_in_HI)
    shape = cd_in_HI.shape
    dtype = cd_in_HI.dtype
    vol = jnp.broadcast_to(jnp.asarray(vol, dtype=dtype), shape)
    i_state = jnp.broadcast_to(jnp.asarray(i_state, dtype=dtype), shape)

    phi = zero_photrates(shape, dtype,
                         nbands=qt.sigma_HI.shape[0] if track_bands
                         else 0)
    for sq, nflux in ((qt.bb, nflux_bb), (qt.pl, nflux_pl),
                      (qt.qso, nflux_qso)):
        if sq is None or nflux is None:
            continue
        nflux = jnp.broadcast_to(jnp.asarray(nflux, dtype=dtype), shape)
        # "auto" node mode represents a source type as a tuple of
        # uniform-K band blocks; their rates are additive over bands
        blocks = (sq,) if isinstance(sq, SourceQuad) else sq
        for blk in blocks:
            phi = phi + _one_source_quad(
                qt, blk, nflux,
                cd_in_HI, colum_out_HI, colum_in_HeI, colum_out_HeI,
                colum_in_HeII, colum_out_HeII, vol, i_state,
                do_heating, track_bands=track_bands)
    return phi
