"""Photon-loss redistribution: recycle escaped photons into the grid.

Re-design of the reference's *disabled and incomplete* hook
``distribute_photon_losses`` (evolve_point.F90:654-731, fed by
``photon_loss_all/mesh^3`` at evolve.F90:451-459).  The reference
version only handles 7 frequency bands and ships with its species
scale factors uninitialized ("It should not be used until this is
solved", evolve_point.F90:650-652); this implementation is correct
over the full 47-band axis.

Semantics (the reference's own "scale and then divide" compromise,
evolve_point.F90:699-703):

- each band's escaped photon rate ``L_b`` is spread uniformly over the
  grid: every cell absorbs ``L_b / mesh^3`` photons/s;
- within a cell the band's photons are attributed to the neutral
  species by their absorption shares ``N_s sigma_s(b) / sum_s' N_s'
  sigma_s'(b)`` (band-averaged cross sections, the same live-band
  gating as the sweep);
- the per-ion photoionization rate added to species ``s`` is the
  cell's absorbed share divided by its neutral density and the cell
  volume.

Because the species share divided by ``N_s`` collapses to
``sigma_s(b) / sum_s' N_s' sigma_s'(b)``, the whole update is two
small matmuls that ride the MXU:

    denom[c, b] = N[c, :] @ sig[:, b]          # (n, 3) @ (3, nb)
    dphi[c, s]  = (1/denom)[c, :] @ W[:, s]    # (n, nb) @ (nb, 3)

with ``W[b, s] = L_b sigma_s(b) / (mesh^3 V)``.  The budget closes
exactly: sum_cells sum_s dphi_s N_s V == sum_b L_b (see
tests/test_photon_losses.py).

Like the reference hook, only ionization rates are updated (the
escaped photons' heat deposition is not redistributed).
"""

import jax.numpy as jnp

from .. import constants as const
from .source_sweep import RateGrids, SourceFields


def distribute_photon_losses(tables, rates: RateGrids,
                             fields: SourceFields, vol_over_scale,
                             floor: float = 1.0e-30) -> RateGrids:
    """Add the redistributed per-band photon losses to the rate grids.

    ``tables``: QuadTables (for the band-averaged cross sections and
    the He band gates).  ``rates.photon_loss_bands`` must be present
    (sweep ran with ``track_band_loss=True``).  ``vol_over_scale`` is
    the cell volume in the sweep's scaled flux units (dr^3 /
    flux_scale), so the added rates are in the same per-ion units as
    the swept ones.  ``floor`` clamps the neutral densities so fully
    ionized cells still absorb their share (the reference's epsilon
    guards, evolve_point.F90:676-681)."""
    plb = rates.photon_loss_bands
    if plb is None:
        raise ValueError(
            "rates carry no per-band photon loss: run the sweep with "
            "SweepConfig(track_band_loss=True)")
    ndens = fields.ndens
    dtype = ndens.dtype
    n = ndens.size

    # neutral species densities (cm^-3), epsilon-floored
    N = jnp.stack([
        ndens * fields.h_av0 * (1.0 - const.abu_he),
        ndens * fields.he_av0 * const.abu_he,
        ndens * fields.he_av1 * const.abu_he,
    ], axis=-1)
    N = jnp.maximum(N, jnp.asarray(floor, dtype))

    # (3, nb) band-averaged cross sections with the He band gates
    sig = jnp.stack([
        tables.sigma_HI,
        tables.sigma_HeI * tables.mask_HeI,
        tables.sigma_HeII * tables.mask_HeII,
    ]).astype(dtype)

    denom = N @ sig                                  # (n, nb)
    inv = 1.0 / denom
    # W[b, s] = L_b sigma_s(b) / (mesh^3 V)
    W = (plb[:, None] * sig.T) / (n * vol_over_scale)  # (nb, 3)
    dphi = inv @ W                                   # (n, 3)

    return rates._replace(phih=rates.phih + dphi[:, 0],
                          phihe0=rates.phihe0 + dphi[:, 1],
                          phihe1=rates.phihe1 + dphi[:, 2])
