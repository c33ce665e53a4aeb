"""Per-source wavefront ray trace + rate accumulation.

Re-implementation of the hot path of the reference:
``do_source`` (evolve_source.F90:66-238) + ``evolve0D``
(evolve_point.F90:79-319), re-expressed as a `lax.scan` over causal L1
wavefront shells with every shell processed as one vectorised batch
(cinterp gather -> 47-band table lookup -> scatter of rates and
outgoing column densities).

Source batching: `sweep_sources_accumulate` scans over the source list
and accumulates the photo-ionization/heating rate grids, the SPMD analog
of the reference's source loop + MPI_ALLREDUCE(SUM)
(master_slave.F90:62-95, evolve.F90:505-548); sharding over devices is
layered on top in `c2ray_tpu.parallel`.
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


def zero_rate_grids(mesh: int, dtype) -> RateGrids:
    n = mesh**3
    z = jnp.zeros(n, dtype=dtype)
    return RateGrids(phih=z, phihe0=z, phihe1=z, phiheat=z,
                     photon_loss=jnp.zeros((), dtype=dtype))


def _cell_rates(cfg: SweepConfig, cd_in, cd_out, vol_ph, nflux, i_state):
    fn = (photoion_rates_quad if isinstance(cfg.tables, QuadTables)
          else photoion_rates)
    return fn(
        cfg.tables,
        cd_in[0], cd_out[0], cd_in[1], cd_out[1], cd_in[2], cd_out[2],
        vol_ph, i_state,
        nflux_bb=nflux[0] if cfg.has_bb else None,
        nflux_pl=nflux[1] if cfg.has_pl else None,
        nflux_qso=nflux[2] if cfg.has_qso else None,
        do_heating=not cfg.isothermal,
    )


def sweep_one_source(cfg: SweepConfig, shells: ShellTable,
                     fields: SourceFields, srcpos, nflux,
                     rates_in: RateGrids) -> RateGrids:
    """Trace one source and add its rates into ``rates_in``.

    srcpos: (3,) int32 (0-based); nflux: (3,) normalised fluxes
    (BB, PL, QSO) of this source (NormFlux*, sourceprops_test.F90:38-48).
    """
    mesh = cfg.mesh
    n = mesh**3
    dtype = fields.ndens.dtype
    dr = jnp.asarray(cfg.dr, dtype=dtype)
    # volumes are handled in units of the cell volume with the cell
    # volume folded into the flux scale: cm^3 volumes (~1e63) overflow
    # float32, and only the ratio vol_ph/vol_cell and the combined factor
    # vol_cell/flux_scale ever enter the rate formulas.
    vol_over_scale = jnp.asarray(cfg.vol / cfg.flux_scale, dtype=dtype)

    # per-source outgoing-column grids, with one dummy slot for padding
    # (the reference zeroes mesh^3 arrays per source,
    # evolve_source.F90:94-95; we allocate-once per trace)
    cdh = jnp.zeros(n + 1, dtype=dtype)
    cdhe0 = jnp.zeros(n + 1, dtype=dtype)
    cdhe1 = jnp.zeros(n + 1, dtype=dtype)

    phih = jnp.concatenate([rates_in.phih, jnp.zeros(1, dtype=dtype)])
    phihe0 = jnp.concatenate([rates_in.phihe0, jnp.zeros(1, dtype=dtype)])
    phihe1 = jnp.concatenate([rates_in.phihe1, jnp.zeros(1, dtype=dtype)])
    phiheat = jnp.concatenate([rates_in.phiheat, jnp.zeros(1, dtype=dtype)])
    ploss = rates_in.photon_loss

    src_flat = (srcpos[0] * mesh + srcpos[1]) * mesh + srcpos[2]

    # fractions are clamped at epsilon when a cell is loaded
    # (evolve_point.F90:120-132)
    def gather(f, idx):
        return jnp.maximum(f[idx], cfg.epsilon)

    # ---- source cell (evolve_point.F90:140-151): vol_ph = cell volume
    path0 = 0.5 * dr
    nd0 = fields.ndens[src_flat]
    h_av0_s = gather(fields.h_av0, src_flat)
    he_av0_s = gather(fields.he_av0, src_flat)
    he_av1_s = gather(fields.he_av1, src_flat)
    cc0 = (coldens(path0, h_av0_s, nd0, 1.0 - const.abu_he),
           coldens(path0, he_av0_s, nd0, const.abu_he),
           coldens(path0, he_av1_s, nd0, const.abu_he))
    zero = jnp.zeros((), dtype=dtype)
    phi0 = _cell_rates(cfg, (zero, zero, zero), cc0,
                       vol_over_scale, nflux,
                       gather(fields.h_av1, src_flat))
    cdh = cdh.at[src_flat].set(cc0[0])
    cdhe0 = cdhe0.at[src_flat].set(cc0[1])
    cdhe1 = cdhe1.at[src_flat].set(cc0[2])
    phih = phih.at[src_flat].add(
        phi0.photo_cell_HI / (h_av0_s * nd0 * (1.0 - const.abu_he)))
    phihe0 = phihe0.at[src_flat].add(
        phi0.photo_cell_HeI / (he_av0_s * nd0 * const.abu_he))
    phihe1 = phihe1.at[src_flat].add(
        phi0.photo_cell_HeII / (he_av1_s * nd0 * const.abu_he))
    if not cfg.isothermal:
        phiheat = phiheat.at[src_flat].add(phi0.heat)

    # ---- wavefront scan over shells
    xs = (jnp.asarray(shells.offsets), jnp.asarray(shells.mask),
          jnp.asarray(shells.boundary))

    def shell_step(carry, x):
        cdh, cdhe0, cdhe1, phih, phihe0, phihe1, phiheat, ploss = carry
        offs, mask, on_bound = x  # (W,3), (W,), (W,)

        cd_in_h, cd_in_he0, cd_in_he1, path = cinterp_shell(
            offs, srcpos, mesh, cdh[:n], cdhe0[:n], cdhe1[:n])
        path = path * dr

        pos = jnp.mod(srcpos[None, :] + offs, mesh)
        flat = (pos[:, 0] * mesh + pos[:, 1]) * mesh + pos[:, 2]
        safe = jnp.where(mask, flat, n)

        offf = offs.astype(dtype)
        dist2_cells = (offf[:, 0] ** 2 + offf[:, 1] ** 2
                       + offf[:, 2] ** 2)
        # shell volume in cell-volume units: 4 pi (d/dr)^2 (path/dr)
        vol_ratio = 4.0 * const.pi * dist2_cells * (path / dr)

        # LLS fog adds to the incoming column (evolve_point.F90:177-180)
        if cfg.coldensh_LLS > 0.0:
            cd_in_h = cd_in_h + cfg.coldensh_LLS * path / dr

        nd = gather(fields.ndens, flat)
        h_av0 = gather(fields.h_av0, flat)
        h_av1 = gather(fields.h_av1, flat)
        he_av0 = gather(fields.he_av0, flat)
        he_av1 = gather(fields.he_av1, flat)

        # outgoing columns = in + time-averaged cell column
        # (evolve_point.F90:237-244)
        cd_out_h = cd_in_h + coldens(path, h_av0, nd, 1.0 - const.abu_he)
        cd_out_he0 = cd_in_he0 + coldens(path, he_av0, nd, const.abu_he)
        cd_out_he1 = cd_in_he1 + coldens(path, he_av1, nd, const.abu_he)

        cdh = cdh.at[safe].set(cd_out_h)
        cdhe0 = cdhe0.at[safe].set(cd_out_he0)
        cdhe1 = cdhe1.at[safe].set(cd_out_he1)

        phi = _cell_rates(cfg, (cd_in_h, cd_in_he0, cd_in_he1),
                          (cd_out_h, cd_out_he0, cd_out_he1),
                          vol_ratio * vol_over_scale, nflux, h_av1)

        # shielded cells get zero rates (evolve_point.F90:250,279-290)
        live = mask & (cd_in_h < cfg.max_coldensh)
        fl = live.astype(dtype)
        phih = phih.at[safe].add(
            fl * phi.photo_cell_HI / (h_av0 * nd * (1.0 - const.abu_he)))
        phihe0 = phihe0.at[safe].add(
            fl * phi.photo_cell_HeI / (he_av0 * nd * const.abu_he))
        phihe1 = phihe1.at[safe].add(
            fl * phi.photo_cell_HeII / (he_av1 * nd * const.abu_he))
        if not cfg.isothermal:
            phiheat = phiheat.at[safe].add(fl * phi.heat)

        # photon loss through the trace boundary (evolve_point.F90:310-315)
        ploss = ploss + jnp.sum(
            jnp.where(live & on_bound, phi.photo_out / vol_ratio, 0.0))

        return (cdh, cdhe0, cdhe1, phih, phihe0, phihe1, phiheat,
                ploss), None

    carry = (cdh, cdhe0, cdhe1, phih, phihe0, phihe1, phiheat, ploss)
    carry, _ = jax.lax.scan(shell_step, carry, xs)
    _, _, _, phih, phihe0, phihe1, phiheat, ploss = carry

    return RateGrids(phih=phih[:n], phihe0=phihe0[:n], phihe1=phihe1[:n],
                     phiheat=phiheat[:n], photon_loss=ploss)


def sweep_sources_accumulate(cfg: SweepConfig, shells: ShellTable,
                             fields: SourceFields,
                             srcpos_batch, nflux_batch,
                             batch_size: int = 8) -> RateGrids:
    """Trace a batch of sources, accumulating rates.

    srcpos_batch: (S, 3) int32; nflux_batch: (S, 3).  Sources with all
    fluxes zero are no-ops (used for padding in sharded runs).

    Sources are processed ``batch_size`` at a time with `vmap` inside
    the shell scan: the wavefront shells of different sources are
    mutually independent, so batching multiplies the per-scan-step work
    by the batch size without extra sequential steps.  This is the TPU
    analog of the reference running sources on different OpenMP
    threads/MPI ranks (evolve_source.F90:149-194, master_slave.F90) --
    but batched into one kernel instead of thread-parallel.
    """
    dtype = fields.ndens.dtype
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

    rates0 = zero_rate_grids(cfg.mesh, dtype)
    # tie the zero-initialised accumulators to the (possibly sharded)
    # source inputs so their device-variance matches the scan body under
    # shard_map (jax "varying manual axes" typing)
    tie = jnp.asarray(nflux_batch, dtype=dtype).ravel()[0] * 0.0
    rates0 = jax.tree.map(lambda a: a + tie, rates0)

    empty = jax.tree.map(jnp.zeros_like, rates0)

    def group(rates, src):
        srcpos, nflux = src  # (B, 3), (B, 3)
        per_source = jax.vmap(
            lambda sp, nf: sweep_one_source(cfg, shells, fields, sp, nf,
                                            empty))(srcpos, nflux)
        # zero out padded (zero-flux) sources, then reduce over the batch
        live = jnp.any(nflux > 0.0, axis=1)

        def reduce_leaf(acc, leaf):
            lv = live.reshape((B,) + (1,) * (leaf.ndim - 1))
            return acc + jnp.sum(jnp.where(lv, leaf, 0.0), axis=0)

        rates = jax.tree.map(reduce_leaf, rates, per_source)
        return rates, None

    rates, _ = jax.lax.scan(group, rates0, (srcpos_g, nflux_g))
    return rates
