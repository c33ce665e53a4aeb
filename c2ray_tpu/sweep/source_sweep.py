"""Per-source wavefront ray trace + rate accumulation.

Re-implementation of the hot path of the reference:
``do_source`` (evolve_source.F90:66-238) + ``evolve0D``
(evolve_point.F90:79-319), re-expressed as a `lax.scan` over causal L1
wavefront shells with every shell processed as one vectorised batch
(cinterp gather -> quadrature band rates -> scatter of rates and
outgoing column densities).

TPU layout notes: gathers and scatters on TPU cost per *index*, so the
three species' column grids are interleaved as one (ncells, 3) array
and the four rate grids as (ncells, 4) -- each corner fetch / rate
deposit moves a small vector per index instead of repeating the index
walk per field.

Source batching: `sweep_sources_accumulate` processes sources in vmapped
groups; the accumulated rate grids are the SPMD analog of the
reference's source loop + MPI_ALLREDUCE(SUM) (master_slave.F90:62-95,
evolve.F90:505-548); device sharding is layered on top in
`c2ray_tpu.parallel`.
"""

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..chemistry import coldens
from ..radiation.photo import photoion_rates
from ..radiation.quadrature import QuadTables, photoion_rates_quad
from ..radiation.tables import RadiationTables
from .cinterp import cinterp_shell
from .geometry import ShellTable

# evolve_point.F90:91 -- stop rate computation in fully shielded cells
MAX_COLDENSH = 2.0e29

# abundance weights per species column, order (HI, HeI, HeII)
_ABU = (1.0 - const.abu_he, const.abu_he, const.abu_he)


@dataclass(frozen=True)
class SweepConfig:
    """Static sweep configuration."""

    # RadiationTables (tau-table lookup) or QuadTables (gather-free
    # exponential-sum quadrature; the fast path on TPU)
    tables: object
    mesh: int
    dr: float
    isothermal: bool = False
    epsilon: float = 1.0e-20
    max_coldensh: float = MAX_COLDENSH
    # homogeneous LLS opacity column per cell (type 1,
    # c2ray_parameters.f90:72-78); 0 disables
    coldensh_LLS: float = 0.0
    # tables were built divided by this (f32 range guard); the lookup
    # divides the shell volume by it so cell rates come out physical
    flux_scale: float = 1.0
    has_bb: bool = True
    has_pl: bool = False
    has_qso: bool = False
    source_batch: int = 8
    # pyramid engine: sources vmapped together per scan step (0 = auto
    # from an HBM budget; large meshes chunk so per-source O(M^3 C)
    # intermediates don't OOM -- 256^3 x 8 needs this)
    source_chunk: int = 0
    # track the escaping-photon budget resolved over the full band
    # axis (quadrature path + pyramid engine only): the input to the
    # flag-gated photon-loss redistribution (distribute_photon_losses;
    # the reference's disabled 7-band hook, evolve_point.F90:654-731)
    track_band_loss: bool = False

    @property
    def vol(self) -> float:
        return self.dr**3


class SourceFields(NamedTuple):
    """Flattened (mesh^3,) grid fields the sweep reads."""

    ndens: jnp.ndarray
    h_av0: jnp.ndarray
    h_av1: jnp.ndarray
    he_av0: jnp.ndarray
    he_av1: jnp.ndarray


class RateGrids(NamedTuple):
    """Flattened (mesh^3,) accumulated rate grids (evolve_data.F90:40-49)."""

    phih: jnp.ndarray
    phihe0: jnp.ndarray
    phihe1: jnp.ndarray
    phiheat: jnp.ndarray
    photon_loss: jnp.ndarray  # scalar
    # scalar: photons absorbed by the LLS fog this iteration
    # (photonstatistics.f90:59,250-267; zeroed per iteration like
    # photon_loss, evolve.F90:371-381)
    lls_loss: jnp.ndarray = 0.0
    # (nbands,) escaping-photon rate per band, present only when the
    # sweep ran with track_band_loss (else None); feeds
    # distribute_photon_losses
    photon_loss_bands: Optional[jnp.ndarray] = None


def zero_rate_grids(mesh: int, dtype) -> RateGrids:
    n = mesh**3
    z = jnp.zeros(n, dtype=dtype)
    return RateGrids(phih=z, phihe0=z, phihe1=z, phiheat=z,
                     photon_loss=jnp.zeros((), dtype=dtype),
                     lls_loss=jnp.zeros((), dtype=dtype))


def _cell_rates(cfg: SweepConfig, cd_in, cd_out, vol_ph, nflux, i_state):
    """cd_in/cd_out: (..., 3) species columns."""
    quad = isinstance(cfg.tables, QuadTables)
    fn = photoion_rates_quad if quad else photoion_rates
    kw = {}
    if quad and cfg.track_band_loss:
        kw["track_bands"] = True
    return fn(
        cfg.tables,
        cd_in[..., 0], cd_out[..., 0], cd_in[..., 1], cd_out[..., 1],
        cd_in[..., 2], cd_out[..., 2],
        vol_ph, i_state,
        nflux_bb=nflux[0] if cfg.has_bb else None,
        nflux_pl=nflux[1] if cfg.has_pl else None,
        nflux_qso=nflux[2] if cfg.has_qso else None,
        do_heating=not cfg.isothermal,
        **kw,
    )


def _sweep_one_source_stacked(cfg: SweepConfig, shells_xs, fstack,
                              srcpos, nflux):
    """Trace one source; returns (rate_stack (n, 4), photon_loss).

    fstack: (n, 5) stacked fields [ndens, h_av0, h_av1, he_av0, he_av1]
    (epsilon-clamps applied by the caller, evolve_point.F90:120-132).
    """
    mesh = cfg.mesh
    n = mesh**3
    dtype = fstack.dtype
    dr = jnp.asarray(cfg.dr, dtype=dtype)
    # volumes are in cell-volume units with the cell volume folded into
    # the flux scale (cm^3 volumes overflow float32); see SweepConfig
    vol_over_scale = jnp.asarray(cfg.vol / cfg.flux_scale, dtype=dtype)
    abu = jnp.asarray(_ABU, dtype=dtype)

    # per-source outgoing-column grid (n+1, 3), one dummy slot for padding
    # (the reference zeroes mesh^3 arrays per source,
    # evolve_source.F90:94-95)
    cd_all = jnp.zeros((n + 1, 3), dtype=dtype)
    # accumulated rates (n+1, 4): phih, phihe0, phihe1, phiheat.
    # `ploss` is tied to the source inputs so its device-variance matches
    # the scan body under shard_map (jax "varying manual axes" typing)
    rg = jnp.zeros((n + 1, 4), dtype=dtype)
    ploss = jnp.zeros((), dtype=dtype) + nflux[0] * 0.0
    lls_loss = jnp.zeros((), dtype=dtype) + nflux[0] * 0.0

    src_flat = (srcpos[0] * mesh + srcpos[1]) * mesh + srcpos[2]

    def neutral_cols(f):
        """(..., 5) fields -> neutral-species stack (..., 3):
        (n*h_av0, n*he_av0, n*he_av1)."""
        return jnp.stack([f[..., 1], f[..., 3], f[..., 4]], axis=-1) \
            * f[..., 0:1]

    # ---- source cell (evolve_point.F90:140-151): vol_ph = cell volume
    f0 = fstack[src_flat]
    cc0 = neutral_cols(f0) * (0.5 * dr) * abu
    zero3 = jnp.zeros(3, dtype=dtype)
    phi0 = _cell_rates(cfg, zero3, cc0, vol_over_scale, nflux, f0[2])
    cd_all = cd_all.at[src_flat].set(cc0)
    denom0 = neutral_cols(f0) * abu
    rates0 = jnp.stack([phi0.photo_cell_HI / denom0[0],
                        phi0.photo_cell_HeI / denom0[1],
                        phi0.photo_cell_HeII / denom0[2],
                        phi0.heat])
    rg = rg.at[src_flat].add(rates0)

    def shell_step(carry, x):
        cd_all, rg, ploss, lls_loss = carry
        offs, mask, on_bound = x  # (W,3), (W,), (W,)

        cd_in, path = cinterp_shell(offs, srcpos, mesh, cd_all[:n])
        path = path * dr

        pos = jnp.mod(srcpos[None, :] + offs, mesh)
        flat = (pos[:, 0] * mesh + pos[:, 1]) * mesh + pos[:, 2]
        safe = jnp.where(mask, flat, n)

        offf = offs.astype(dtype)
        dist2_cells = (offf[:, 0] ** 2 + offf[:, 1] ** 2
                       + offf[:, 2] ** 2)
        vol_ratio = 4.0 * const.pi * dist2_cells * (path / dr)

        # LLS fog adds to the incoming HI column
        # (evolve_point.F90:177-180)
        lls_add = None
        if cfg.coldensh_LLS > 0.0:
            lls_add = cfg.coldensh_LLS * path / dr
            cd_in = cd_in.at[:, 0].add(lls_add)

        f = fstack[flat]                                  # (W, 5)
        ncols = neutral_cols(f)                           # (W, 3)

        # outgoing columns = in + time-averaged cell column
        # (evolve_point.F90:237-244)
        cd_out = cd_in + ncols * path[:, None] * abu
        cd_all = cd_all.at[safe].set(cd_out)

        phi = _cell_rates(cfg, cd_in, cd_out,
                          vol_ratio * vol_over_scale, nflux, f[:, 2])

        # shielded cells get zero rates (evolve_point.F90:250,279-290)
        live = mask & (cd_in[:, 0] < cfg.max_coldensh)
        fl = live.astype(dtype)
        denom = ncols * abu
        contrib = jnp.stack(
            [fl * phi.photo_cell_HI / denom[:, 0],
             fl * phi.photo_cell_HeI / denom[:, 1],
             fl * phi.photo_cell_HeII / denom[:, 2],
             fl * phi.heat], axis=-1)
        rg = rg.at[safe].add(contrib)

        # photon loss through the trace boundary
        # (evolve_point.F90:310-315)
        ploss = ploss + jnp.sum(
            jnp.where(live & on_bound, phi.photo_out / vol_ratio, 0.0))

        # photons absorbed by the LLS fog (total_LLS_loss,
        # photonstatistics.f90:250-267, evolve_point.F90:277)
        if lls_add is not None:
            tau_lls = const.sigma_HI_at_ion_freq * lls_add
            lls_loss = lls_loss + jnp.sum(jnp.where(
                live, phi.photo_in / vol_ratio * (-jnp.expm1(-tau_lls)),
                0.0))

        return (cd_all, rg, ploss, lls_loss), None

    (cd_all, rg, ploss, lls_loss), _ = jax.lax.scan(
        shell_step, (cd_all, rg, ploss, lls_loss), shells_xs)
    return rg[:n], ploss, lls_loss


def sweep_one_source(cfg: SweepConfig, shells: ShellTable,
                     fields: SourceFields, srcpos, nflux,
                     rates_in: RateGrids) -> RateGrids:
    """Trace one source and add its rates into ``rates_in``.

    srcpos: (3,) int32 (0-based); nflux: (3,) normalised fluxes
    (BB, PL, QSO) of this source (NormFlux*, sourceprops_test.F90:38-48).
    """
    fstack = _stack_fields(cfg, fields)
    xs = _shells_xs(shells)
    rg, ploss, lls = _sweep_one_source_stacked(cfg, xs, fstack, srcpos,
                                               nflux)
    return RateGrids(
        phih=rates_in.phih + rg[:, 0],
        phihe0=rates_in.phihe0 + rg[:, 1],
        phihe1=rates_in.phihe1 + rg[:, 2],
        phiheat=rates_in.phiheat + rg[:, 3],
        photon_loss=rates_in.photon_loss + ploss,
        lls_loss=rates_in.lls_loss + lls)


def _stack_fields(cfg: SweepConfig, fields: SourceFields):
    """(n, 5) field stack with the reference's epsilon clamps on the
    fractions (evolve_point.F90:120-132)."""
    c = lambda x: jnp.maximum(x, cfg.epsilon)
    return jnp.stack([fields.ndens, c(fields.h_av0), c(fields.h_av1),
                      c(fields.he_av0), c(fields.he_av1)], axis=-1)


def _shells_xs(shells: ShellTable):
    return (jnp.asarray(shells.offsets), jnp.asarray(shells.mask),
            jnp.asarray(shells.boundary))


def sweep_sources_accumulate(cfg: SweepConfig, shells: ShellTable,
                             fields: SourceFields,
                             srcpos_batch, nflux_batch,
                             batch_size: Optional[int] = None) -> RateGrids:
    """Trace a batch of sources, accumulating rates.

    srcpos_batch: (S, 3) int32; nflux_batch: (S, 3).  Sources with all
    fluxes zero are no-ops (used for padding in sharded runs).
    Sources are processed ``batch_size`` at a time with `vmap` inside
    the shell scan (the wavefront shells of different sources are
    independent).
    """
    dtype = fields.ndens.dtype
    if batch_size is None:
        batch_size = cfg.source_batch
    S = srcpos_batch.shape[0]
    B = min(batch_size, S)
    pad = (-S) % B
    if pad:
        srcpos_batch = jnp.concatenate(
            [srcpos_batch, jnp.zeros((pad, 3), srcpos_batch.dtype)], axis=0)
        nflux_batch = jnp.concatenate(
            [nflux_batch, jnp.zeros((pad, 3), nflux_batch.dtype)], axis=0)
    n_groups = (S + pad) // B
    srcpos_g = srcpos_batch.reshape(n_groups, B, 3)
    nflux_g = nflux_batch.reshape(n_groups, B, 3)

    fstack = _stack_fields(cfg, fields)
    xs = _shells_xs(shells)
    n = cfg.mesh**3

    # tie the zero-initialised accumulators to the (possibly sharded)
    # source inputs so their device-variance matches the scan body under
    # shard_map (jax "varying manual axes" typing)
    tie = jnp.asarray(nflux_batch, dtype=dtype).ravel()[0] * 0.0
    rg0 = jnp.zeros((n, 4), dtype=dtype) + tie
    pl0 = jnp.zeros((), dtype=dtype) + tie

    def group(carry, src):
        rg_acc, pl_acc, lls_acc = carry
        srcpos, nflux = src  # (B, 3), (B, 3)
        rg, pl, lls = jax.vmap(
            lambda sp, nf: _sweep_one_source_stacked(cfg, xs, fstack,
                                                     sp, nf))(srcpos, nflux)
        live = jnp.any(nflux > 0.0, axis=1)
        rg_acc = rg_acc + jnp.sum(
            jnp.where(live[:, None, None], rg, 0.0), axis=0)
        pl_acc = pl_acc + jnp.sum(jnp.where(live, pl, 0.0))
        lls_acc = lls_acc + jnp.sum(jnp.where(live, lls, 0.0))
        return (rg_acc, pl_acc, lls_acc), None

    (rg, pl, lls), _ = jax.lax.scan(group, (rg0, pl0, pl0),
                                    (srcpos_g, nflux_g))
    return RateGrids(phih=rg[:, 0], phihe0=rg[:, 1], phihe1=rg[:, 2],
                     phiheat=rg[:, 3], photon_loss=pl, lls_loss=lls)
