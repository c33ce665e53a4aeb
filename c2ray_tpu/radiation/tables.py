"""Photoionization / heating rate tables (tau-indexed, device-resident).

Re-implementation of ``code/radiation_tables.f90``: for every frequency
sub-band, integrate  SED(nu) * exp(-tau * sigma(nu)/sigma_0)  ("thick")
and the same integrand multiplied by sigma(nu)/sigma_0 ("thin") over the
sub-band, for a log-spaced grid of 2001 optical depths
(radiation_tables.f90:59-61, 593-660), plus heating variants weighted by
h*(nu - nu_threshold) per absorbing species
(radiation_tables.f90:664-783).

The build is a single vectorised numpy einsum per source type instead of
the reference's nested loops; the result ships to the device once and
lives in HBM for the whole run.  Band-range restrictions per source type
(BB exp cutoff at h nu/kT > 25, PL/QSO frequency limits,
radiation_tables.f90:194-256) are applied by zeroing table columns, which
makes the runtime lookup branch-free.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..romberg import romberg_weights
from .bands import Bands, NumFreq, NumTau, make_bands
from .sed import (SEDConfig, blackbody_photon_density, normalize_seds,
                  powerlaw_photon_density)

minlogtau = -20.0  # radiation_tables.f90:59
maxlogtau = 4.0    # radiation_tables.f90:60
dlogtau = (maxlogtau - minlogtau) / NumTau


class SourceTypeTables(NamedTuple):
    """Rate tables for one source type (shapes: (NumTau+1, nbands) photo,
    (NumTau+1, nheatbins) heat)."""

    photo_thick: jnp.ndarray
    photo_thin: jnp.ndarray
    heat_thick: Optional[jnp.ndarray]
    heat_thin: Optional[jnp.ndarray]


class RadiationTables(NamedTuple):
    """Everything the runtime rate lookup needs, as device arrays.

    Leaves only (jit-traceable); static band metadata lives in `Bands`.
    """

    # per-source-type tables (None when the source type is absent)
    bb: Optional[SourceTypeTables]
    pl: Optional[SourceTypeTables]
    qso: Optional[SourceTypeTables]
    # band data needed at runtime, shape (nbands,)
    sigma_HI: jnp.ndarray
    sigma_HeI: jnp.ndarray
    sigma_HeII: jnp.ndarray
    # secondary-ionization factors (zeros when isothermal), shape (nbands,)
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
    # heating-table column index per (band, species); invalid -> 0
    hbin_HI: jnp.ndarray
    hbin_HeI: jnp.ndarray
    hbin_HeII: jnp.ndarray
    # species validity masks per band (float 0/1)
    mask_HeI: jnp.ndarray
    mask_HeII: jnp.ndarray


def _tau_grid() -> np.ndarray:
    """tau(0)=0, then 10^(minlogtau + dlogtau*(i-1)) (radiation_tables.f90:183-188)."""
    tau = np.zeros(NumTau + 1)
    i = np.arange(1, NumTau + 1)
    tau[1:] = 10.0 ** (minlogtau + dlogtau * (i - 1))
    return tau


def _build_source_tables(bands: Bands, sed_photon_density, band_lo, band_hi,
                         isothermal, dtype):
    """Integrate the thick/thin photo and heating tables for one source.

    ``sed_photon_density(freq)``: photon-sense SED already scaled
    (includes 4 pi R*^2 or pl_scaling).
    Bands outside [band_lo, band_hi] (inclusive, 0-based) get zero columns.
    """
    nb = bands.nbands
    tau = _tau_grid()                       # (ntau,)
    w = romberg_weights(NumFreq)            # (nf,)

    photo_thick = np.zeros((NumTau + 1, nb))
    photo_thin = np.zeros((NumTau + 1, nb))
    heat_thick = None if isothermal else np.zeros((NumTau + 1, bands.nheatbins))
    heat_thin = None if isothermal else np.zeros((NumTau + 1, bands.nheatbins))

    thresholds = (const.ion_freq_HI, const.ion_freq_HeI, const.ion_freq_HeII)
    # species whose heating bins exist per band region, and the power-law
    # index of the cross-section frequency dependence used per band
    # (radiation_tables.f90:264-388): band1 -> HI index, band2 -> HeI,
    # band3 -> HeII.
    for b in range(nb):
        if b < band_lo or b > band_hi:
            continue
        freq = bands.freq_min[b] + bands.delta_freq[b] * np.arange(NumFreq + 1)
        if b < bands.nbnd1:
            pli = bands.pli_HI[b]
            species = (0,)
        elif b < bands.nbnd1 + bands.nbnd2:
            pli = bands.pli_HeI[b]
            species = (0, 1)
        else:
            pli = bands.pli_HeII[b]
            species = (0, 1, 2)
        # sigma(nu)/sigma_0 within the band (radiation_tables.f90:569-588)
        csfd = (freq / bands.freq_min[b]) ** (-pli)          # (nf,)
        sed = sed_photon_density(freq)                       # (nf,)

        # exp(-tau * csfd) with overflow guard (radiation_tables.f90:607)
        expo = tau[:, None] * csfd[None, :]                  # (ntau, nf)
        atten = np.where(expo < 700.0, np.exp(-np.minimum(expo, 700.0)), 0.0)

        integ_thick = sed[None, :] * atten                   # (ntau, nf)
        integ_thin = integ_thick * csfd[None, :]
        dnu = bands.delta_freq[b]
        photo_thick[:, b] = (integ_thick * w[None, :]).sum(axis=1) * dnu
        photo_thin[:, b] = (integ_thin * w[None, :]).sum(axis=1) * dnu

        if not isothermal:
            for s in species:
                hw = const.hplanck * (freq - thresholds[s])  # (nf,)
                col = bands.heat_bin_index(b, s)
                heat_thick[:, col] = ((integ_thick * hw[None, :]) * w[None, :]
                                      ).sum(axis=1) * dnu
                heat_thin[:, col] = ((integ_thin * hw[None, :]) * w[None, :]
                                     ).sum(axis=1) * dnu

    to = lambda a: None if a is None else jnp.asarray(a, dtype=dtype)
    return SourceTypeTables(photo_thick=to(photo_thick),
                            photo_thin=to(photo_thin),
                            heat_thick=to(heat_thick),
                            heat_thin=to(heat_thin))


def _bb_band_limits(bands: Bands, h_over_kT) -> tuple:
    """BB usable band range: cut when h nu_min/kT > 25
    (radiation_tables.f90:194-199)."""
    hi = bands.nbands - 1
    for b in range(bands.nbands):
        if bands.freq_min[b] * h_over_kT > 25.0:
            hi = b - 1
            break
    return 0, hi


def _pl_band_limits(bands: Bands, min_freq, max_freq) -> tuple:
    """PL/QSO band range (radiation_tables.f90:208-256)."""
    hi = bands.nbands - 1
    for b in range(bands.nbands):
        if bands.freq_min[b] > max_freq:
            hi = b - 1
            break
    lo = 0
    for b in range(bands.nbands - 1, -1, -1):
        if bands.freq_min[b] < min_freq:
            lo = b
            break
    return lo, hi


def build_radiation_tables(sed: SEDConfig, bands: Optional[Bands] = None, *,
                           isothermal=False, dtype=jnp.float64,
                           flux_scale: Optional[float] = None) -> tuple:
    """Full `rad_ini` equivalent (radiation_tables.f90:141-168).

    Normalizes the SEDs against the band range and integrates all tables.
    Returns (RadiationTables, normalized SEDConfig, Bands).

    ``flux_scale``: tables are stored divided by this factor so their
    values stay in float32 range on TPU (S_star ~ 1e48-1e57 overflows
    f32).  The runtime lookup recovers physical cell rates by dividing
    the shell volume by the same factor (see SweepConfig.flux_scale);
    photo_in/photo_out/photon_loss then carry units of ``flux_scale``
    photons/s.  Defaults to 1.0 for f64 and to the total source photon
    rate for f32.
    """
    if bands is None:
        bands = make_bands()
    # canonicalize to the dtype the backend actually delivers (a
    # requested float64 truncates to float32 on TPU without x64; the
    # unscaled tables would overflow f32)
    dtype = jnp.empty((), dtype).dtype
    sed = normalize_seds(sed, bands.freq_min[0], bands.freq_max[-1],
                         edges=bands.freq_max[:-1])

    if flux_scale is None:
        if dtype == jnp.float64:
            flux_scale = 1.0
        else:
            flux_scale = sum(s.S_star for s in (sed.bb, sed.pl, sed.qso)
                             if s is not None)

    bb_tables = pl_tables = qso_tables = None
    inv = 1.0 / flux_scale
    if sed.bb is not None:
        lo, hi = _bb_band_limits(bands, sed.bb.h_over_kT)
        R2 = sed.bb.R_star**2
        bb_tables = _build_source_tables(
            bands,
            lambda f: inv * 4.0 * const.pi * R2
            * blackbody_photon_density(f, sed.bb.h_over_kT),
            lo, hi, isothermal, dtype)
    if sed.pl is not None:
        lo, hi = _pl_band_limits(bands, sed.pl.min_freq, sed.pl.max_freq)
        pl_tables = _build_source_tables(
            bands,
            lambda f: inv * sed.pl.scaling
            * powerlaw_photon_density(f, sed.pl.index),
            lo, hi, isothermal, dtype)
    if sed.qso is not None:
        lo, hi = _pl_band_limits(bands, sed.qso.min_freq, sed.qso.max_freq)
        qso_tables = _build_source_tables(
            bands,
            lambda f: inv * sed.qso.scaling
            * powerlaw_photon_density(f, sed.qso.index),
            lo, hi, isothermal, dtype)

    nb = bands.nbands
    n1, n2 = bands.nbnd1, bands.nbnd2
    hbin_HI = np.array([bands.heat_bin_index(b, 0) for b in range(nb)])
    hbin_HeI = np.array([bands.heat_bin_index(b, 1) if b >= n1 else 0
                         for b in range(nb)])
    hbin_HeII = np.array([bands.heat_bin_index(b, 2) if b >= n1 + n2 else 0
                          for b in range(nb)])
    mask_HeI = (np.arange(nb) >= n1).astype(np.float64)
    mask_HeII = (np.arange(nb) >= n1 + n2).astype(np.float64)

    zeros = np.zeros(nb)
    f = {name: getattr(bands, name) if getattr(bands, name) is not None
         else zeros
         for name in ("f1ion_HI", "f1ion_HeI", "f1ion_HeII",
                      "f2ion_HI", "f2ion_HeI", "f2ion_HeII",
                      "f1heat_HI", "f1heat_HeI", "f1heat_HeII",
                      "f2heat_HI", "f2heat_HeI", "f2heat_HeII")}

    arr = lambda a: jnp.asarray(a, dtype=dtype)
    tables = RadiationTables(
        bb=bb_tables, pl=pl_tables, qso=qso_tables,
        sigma_HI=arr(bands.sigma_HI), sigma_HeI=arr(bands.sigma_HeI),
        sigma_HeII=arr(bands.sigma_HeII),
        hbin_HI=jnp.asarray(hbin_HI), hbin_HeI=jnp.asarray(hbin_HeI),
        hbin_HeII=jnp.asarray(hbin_HeII),
        mask_HeI=arr(mask_HeI), mask_HeII=arr(mask_HeII),
        **{k: arr(v) for k, v in f.items()},
    )
    import dataclasses
    bands = dataclasses.replace(bands, flux_scale=float(flux_scale))
    return tables, sed, bands
