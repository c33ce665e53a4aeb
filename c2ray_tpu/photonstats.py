"""Photon-conservation accounting.

Re-implementation of ``code/files_for_3D/photonstatistics.f90``: the
running audit that compares ionizations + recombinations against the
photons emitted every timestep -- the reference's built-in correctness
invariant (photonstatistics.f90:272-318).
"""

from typing import NamedTuple

import jax.numpy as jnp

from . import constants as const
from .chemistry import IonFractions, electrondens
from .rates import RateCoeffs
from .state import GridState


class SpeciesInventory(NamedTuple):
    """Volume-integrated atom counts per species (state_before/after,
    photonstatistics.f90:117-144)."""

    h0: jnp.ndarray
    h1: jnp.ndarray
    he0: jnp.ndarray
    he1: jnp.ndarray
    he2: jnp.ndarray


def species_inventory(state: GridState, vol, use_start=True
                      ) -> SpeciesInventory:
    nd = state.ndens
    if use_start:
        f = (state.h0, state.h1, state.he0, state.he1, state.he2)
    else:
        f = (state.h_int0, state.h_int1, state.he_int0, state.he_int1,
             state.he_int2)
    # the volume factor (~1e68 cm^3 per cell at cosmological dr) is
    # applied host-side in float64: an on-device f32 multiply would
    # overflow to inf and poison the conservation report
    ab_h = float(vol) * (1.0 - const.abu_he)
    ab_he = float(vol) * const.abu_he
    return SpeciesInventory(
        h0=float(jnp.sum(nd * f[0])) * ab_h,
        h1=float(jnp.sum(nd * f[1])) * ab_h,
        he0=float(jnp.sum(nd * f[2])) * ab_he,
        he1=float(jnp.sum(nd * f[3])) * ab_he,
        he2=float(jnp.sum(nd * f[4])) * ab_he,
    )


class PhotonBudget(NamedTuple):
    """One timestep's photon budget (report_photonstatistics,
    photonstatistics.f90:272-318)."""

    total_ion: jnp.ndarray        # new ionizations (atoms)
    totrec: jnp.ndarray           # recombinations not producing ions
    totcollisions: jnp.ndarray    # collisional ionizations
    recomions: jnp.ndarray        # He-recombination-driven ionizations
    total_src: jnp.ndarray        # photons emitted
    photon_conservation: jnp.ndarray  # (ion - coll - recomion)/src
    # photons lost over the trace boundary / in LLSs this step
    # (photonstatistics.f90:278-281)
    total_photon_loss: float = 0.0
    total_lls_loss: float = 0.0


def total_rates(state: GridState, rates: RateCoeffs, vol, dt):
    """Recombination / collisional budgets over the step using the
    time-averaged fractions (total_rates, photonstatistics.f90:150-203)."""
    nd = state.ndens
    avg = IonFractions(state.h_av0, state.h_av1, state.he_av0,
                       state.he_av1, state.he_av2)
    ne = electrondens(nd, avg)
    cl = state.clumping

    voldt = float(vol) * float(dt)      # host-side f64 (f32 overflows)
    totrec = float(jnp.sum(
        nd * (avg.h1 * rates.brech0 * (1.0 - const.abu_he)
              + avg.he1 * rates.breche0 * const.abu_he * 0.04)
        * ne * cl)) * voldt
    totcollisions = float(jnp.sum(
        nd * ne * (avg.h0 * rates.colli_HI + avg.he0 * rates.colli_HeI
                   + avg.he1 * rates.colli_HeII))) * voldt
    recomions = float(jnp.sum(
        nd * const.abu_he * cl
        * (avg.he2 * 1.121 * rates.breche1 + avg.he1 * rates.breche0 * 0.96)
        * const.abu_he * ne)) * voldt
    return totrec, totcollisions, recomions


def photon_budget(before: SpeciesInventory, state: GridState,
                  rates: RateCoeffs, vol, dt, total_src,
                  photon_loss=0.0, lls_loss=0.0) -> PhotonBudget:
    """Full conservation report for one step.

    ``total_src``: photons emitted = sum(NormFlux)*S_star*dt
    (photonstatistics.f90:282-288).  ``photon_loss`` / ``lls_loss``
    are the last iteration's loss rates in physical photons/s; they
    enter the report as loss*dt (photonstatistics.f90:278-281).
    """
    after = species_inventory(state, vol, use_start=True)
    # total_ionizations (photonstatistics.f90:239-247)
    dh0 = before.h0 - after.h0
    dhe0 = before.he0 - after.he0
    dhe2 = after.he2 - before.he2
    total_ion = dh0 + dhe0 + dhe2

    totrec, totcoll, recomions = total_rates(state, rates, vol, dt)
    photcons = (total_ion - totcoll - recomions) / max(
        float(total_src), 1e-300)
    return PhotonBudget(
        total_ion=total_ion, totrec=totrec, totcollisions=totcoll,
        recomions=recomions, total_src=float(total_src),
        photon_conservation=photcons,
        total_photon_loss=float(photon_loss) * float(dt),
        total_lls_loss=float(lls_loss) * float(dt))


def photcons_violation(budget: PhotonBudget, tolerance=0.15) -> int:
    """photcons_flag (output.F90:522-533): flag a photon-conservation
    problem when more than `tolerance` of the emitted photons are
    unaccounted for AND the deficit is not explained by photons leaving
    the grid.  (The reference codes this check but leaves it commented
    'until I checked how I calculate those quantities'; the criterion
    here is that commented logic, active.)  Checked by the driver
    against `stop_on_photon_violation` (C2Ray.F90:351-372)."""
    if budget.total_src <= 0.0:
        return 0
    deficit = 1.0 - float(budget.photon_conservation)
    loss_frac = (budget.total_photon_loss + budget.total_lls_loss) \
        / budget.total_src
    if deficit > tolerance and loss_frac < deficit:
        return 1
    return 0
