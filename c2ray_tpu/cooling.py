"""Radiative cooling: per-species cooling curves + table lookup.

Re-implementation of ``code/cooling_h.f90`` (module `radiative_cooling`).
The reference reads five precomputed ASCII tables (H0, H1, He0, He1, He2;
801 points in log10 T in [1, 9]) generated offline from published fits
(``tables/``, ``help_programs/``).  Being a standalone framework we build
the same 801-point tables at start-up from the published fits the
reference's tables were compiled from (see ``cooling_h.f90:113-136``):

- collisional ionization & excitation: Hui & Gnedin (1997) / Cen (1992)
- recombination cooling (case B): Hui & Gnedin (1997)
- free-free: Gaunt-factor bremsstrahlung
- He1 table excludes collisional ionization ("nocollion",
  cooling_h.f90:136) because doric accounts for ionization separately.

The lookup (`coolin`, cooling_h.f90:40-71) is linear interpolation in
log10 T, vectorised over cells.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import constants as const

TEMPPOINTS = 801
MINTEMP_LOG = 1.0
MAXTEMP_LOG = 9.0
DTEMP_LOG = (MAXTEMP_LOG - MINTEMP_LOG) / (TEMPPOINTS - 1)


class CoolingTables(NamedTuple):
    """Λ(T) per species [erg cm^3 / s], linear values, shape (801,)."""

    h0: jnp.ndarray   # cooling per neutral-H fraction (collisional exc+ion)
    h1: jnp.ndarray   # cooling per ionized-H fraction (recomb B + ff)
    he0: jnp.ndarray
    he1: jnp.ndarray
    he2: jnp.ndarray


def _gff(T, Zeff=1.0):
    """Free-free Gaunt factor (Hui & Gnedin 1997 eq. therein)."""
    logt = np.log10(T / Zeff**2)
    return np.where(T < 3.2e5 * Zeff**2,
                    0.79464 + 0.1243 * logt,
                    2.13164 - 0.1240 * logt)


def _build_tables_np():
    """Per-species cooling curves Λ_s(T) [erg cm^3/s] such that the total
    cooling is  n * ne * (Σ_s x_s Λ_s(T) * abundance_s)  -- the same
    contract as the reference tables (cooling_h.f90:59-69)."""
    T = 10.0 ** np.linspace(MINTEMP_LOG, MAXTEMP_LOG, TEMPPOINTS)
    kT_erg = const.k_B * T
    sqT5 = 1.0 + np.sqrt(T / 1e5)

    # --- collisional excitation cooling (Cen 1992 fits)
    ce_HI = 7.5e-19 / sqT5 * np.exp(-118348.0 / T)          # ~ n_e n_H0
    ce_HeII = 5.54e-17 * T**-0.397 / sqT5 * np.exp(-473638.0 / T)  # ~ n_e n_He+

    # --- collisional ionization cooling: Hui & Gnedin (1997) rate fits
    #     (the source the reference tables were compiled from,
    #     cooling_h.f90:115-117) times the ionization energy
    def hg_ci(TthK, A, p, x0, a, b):
        lam = 2.0 * TthK / T
        return (A * T**-1.5 * np.exp(-TthK / T) * lam**p
                / (1.0 + (lam / x0) ** a) ** b)

    ci_HI = hg_ci(const.temph0, 21.11, -1.089, 0.354, 0.874, 1.101) \
        * const.hionen
    ci_HeI = hg_ci(const.temphe[0], 32.38, -1.146, 0.416, 0.987, 1.056) \
        * const.heionen[0]

    # --- recombination cooling, Hui & Gnedin (1997) case-B fits
    lamH = 2.0 * const.temph0 / T
    rec_H1 = (3.435e-30 * T * lamH**1.970
              / (1.0 + (lamH / 2.25) ** 0.376) ** 3.720)
    lamHe1 = 2.0 * const.temphe[0] / T
    # HG97 give the HeII case-B recombination cooling as kT * 1.26e-14 lam^0.75
    rec_He1 = 1.26e-14 * kT_erg * lamHe1**0.75
    # He++ case B: hydrogenic scaling L_Z(T) = Z^3 L_H(T/Z^2); note
    # lam_H(T/4) == lam_HeIII(T), so this is 8 x the H fit at T/4.
    lamHe2 = 2.0 * const.temphe[1] / T
    rec_He2 = (8.0 * 3.435e-30 * (T / 4.0) * lamHe2**1.970
               / (1.0 + (lamHe2 / 2.25) ** 0.376) ** 3.720)

    # --- dielectronic recombination cooling of He+ (Black 1981 / Cen 1992)
    dielec_He1 = (1.24e-13 * T**-1.5 * np.exp(-470000.0 / T)
                  * (1.0 + 0.3 * np.exp(-94000.0 / T)))

    # --- free-free (Gaunt-factor bremsstrahlung)
    ff_1 = 1.426e-27 * np.sqrt(T) * _gff(T, 1.0)        # Z=1: H+, He+
    ff_2 = 1.426e-27 * np.sqrt(T) * 4.0 * _gff(T, 2.0)  # Z=2: He++

    h0 = ce_HI + ci_HI
    h1 = rec_H1 + ff_1
    # He0 table: collisional ionization only (cooling_h.f90:113-117)
    he0 = ci_HeI
    # He1 table: excitation + recombination B + dielectronic + ff, but NO
    # collisional ionization (cooling_h.f90:130-136, "nocollion")
    he1 = ce_HeII + rec_He1 + dielec_He1 + ff_1
    # He2 table: recombination + ff
    he2 = rec_He2 + ff_2

    floor = 1e-50
    return tuple(np.maximum(x, floor) for x in (h0, h1, he0, he1, he2))


def setup_cooling_tables(dtype=jnp.float64) -> CoolingTables:
    """Build the five cooling tables (the `setup_cool` analog,
    cooling_h.f90:76-171)."""
    h0, h1, he0, he1, he2 = _build_tables_np()
    f = lambda a: jnp.asarray(a, dtype=dtype)
    return CoolingTables(h0=f(h0), h1=f(h1), he0=f(he0), he1=f(he1),
                         he2=f(he2))


def coolin(tables: CoolingTables, nucldens, eldens, xh0, xh1, xhe0, xhe1,
           xhe2, temperature, use_matmul=None):
    """Cooling rate [erg cm^-3 s^-1] (cooling_h.f90:40-71), vectorised.

    TPU note (round-3 on-chip bisect, tools/fault_bisect*.py): five
    separate per-species 801-point table gathers inside the fused
    chemistry/thermal while-loop body both trigger an XLA:TPU kernel
    fault and, restructured to a single stacked gather, lower to a slow
    serialized loop (~3.6x the whole pass's steady time at 128^3).  The
    species curves are therefore stacked into one (801, 5) table and,
    on TPU, the row interpolation is computed as a two-hot
    (cells, 801) @ (801, 5) matmul that rides the MXU -- bit-identical
    weights, no gather, immune to the fault.  CPU keeps the gather.
    """
    import jax

    tab5 = jnp.stack([tables.h0, tables.h1, tables.he0, tables.he1,
                      tables.he2], axis=-1)              # (801, 5)
    tpos = (jnp.log10(temperature) - MINTEMP_LOG) / DTEMP_LOG
    itpos = jnp.clip(tpos.astype(jnp.int32), 0, TEMPPOINTS - 2)
    dtpos = tpos - itpos.astype(tpos.dtype)

    if use_matmul is None:
        use_matmul = jax.default_backend() == "tpu"
    if use_matmul:
        shape = jnp.shape(itpos)
        iflat = itpos.reshape(-1)
        dflat = dtpos.reshape(-1)[:, None]
        # two-hot interpolation weights: (1-d) at row i, d at row i+1
        w = (jax.nn.one_hot(iflat, TEMPPOINTS, dtype=dtpos.dtype)
             * (1.0 - dflat)
             + jax.nn.one_hot(iflat + 1, TEMPPOINTS, dtype=dtpos.dtype)
             * dflat)
        lam = (w @ tab5).reshape(shape + (5,))           # (..., 5)
    else:
        lo = tab5[itpos]
        lam = lo + (tab5[itpos + 1] - lo) * dtpos[..., None]

    x5 = jnp.stack([xh0 * (1.0 - const.abu_he),
                    xh1 * (1.0 - const.abu_he),
                    xhe0 * const.abu_he,
                    xhe1 * const.abu_he,
                    xhe2 * const.abu_he], axis=-1)
    return nucldens * eldens * jnp.sum(lam * x5, axis=-1)


def load_ascii_cooling_table(path):
    """Read one reference-format ASCII cooling table
    (cooling_h.f90:83-160): a 3-int header line followed by 801 rows of
    (log10 T, log10 Lambda).  Returns linear Lambda(T) on the module's
    801-point log-T grid (values -50 mean 'zero')."""
    rows = np.loadtxt(path, skiprows=1)
    if rows.shape[0] != TEMPPOINTS:
        raise ValueError(
            f"{path}: expected {TEMPPOINTS} rows, got {rows.shape[0]}")
    logt = rows[:, 0]
    if not np.allclose(logt[0], MINTEMP_LOG) or not np.allclose(
            logt[-1], MAXTEMP_LOG):
        raise ValueError(f"{path}: unexpected log-T grid "
                         f"[{logt[0]}, {logt[-1]}]")
    return 10.0 ** rows[:, 1]


def setup_cooling_tables_from_files(table_dir, dtype=jnp.float64,
                                    filenames=("H0-cool.tab",
                                               "H1-cool-B.tab",
                                               "He0-cool_new.tab",
                                               "He1-cool_new_nocollion.tab",
                                               "He2-cool.tab")):
    """Build CoolingTables from the reference's ASCII files (the exact
    set the current Makefiles link, cooling_h.f90:25-33)."""
    import os

    vals = [load_ascii_cooling_table(os.path.join(table_dir, f))
            for f in filenames]
    arr = lambda a: jnp.asarray(a, dtype=dtype)
    return CoolingTables(h0=arr(vals[0]), h1=arr(vals[1]),
                         he0=arr(vals[2]), he1=arr(vals[3]),
                         he2=arr(vals[4]))
