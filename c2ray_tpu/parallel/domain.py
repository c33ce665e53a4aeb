"""Spatial domain decomposition of the transport sweep.

This is the one parallel mechanism the reference does NOT have and
SURVEY.md section 2.5.6 / section 7 step 6 demand de novo: the
reference replicates the full grid on every MPI rank
(``evolve_data.F90:74-97``, the BCAST-everything input model of
``mat_ini_cubep3m.F90:289-293``) so its maximum problem size is one
node's memory -- the `_compr` module family exists purely to fight
that.  Here the grid is sharded and only boundary planes move:

- **Layout**: every (mesh^3,) field is sharded over the 1D device
  axis ``d`` into x-slabs of ``S = mesh/D`` planes (C-order flatten
  means ``PartitionSpec('d')`` on the flat axis IS x-slab sharding).
- **Sweep**: each source is traced entirely by the device that owns
  its x-slab, on a cubic window of ``Mw = 2*radius + 2`` cells
  centered on the source (the subbox, evolve_source.F90:103-109).
  The window may reach up to ``H = radius + 1`` planes into
  neighboring slabs, so before the source scan each device extends
  its field slab by H halo planes per side with
  ``lax.ppermute`` -- the boundary column-density/field exchange the
  reference avoided by replication.  y/z stay local (cyclic pad).
- **Rates**: each device accumulates its sources' rate windows into a
  halo-extended local rate slab; afterwards the halo chunks are
  ppermuted back and added into the owning neighbors (a reverse halo
  exchange).  The rate grids therefore stay sharded end to end --
  comm volume is O(H * mesh^2) boundary planes per iteration instead
  of the reference's 4 x mesh^3 MPI_ALLREDUCE (evolve.F90:505-548).
- **Chemistry**: the global pass is embarrassingly parallel over
  cells and runs on the local slab; only the scalar convergence count
  and photon/LLS losses are psum-reduced.

Per-device memory is ``O(mesh^3 / D + H * mesh^2)``: the framework
scales past single-chip HBM, which the reference never could.

Work distribution: sources are statically assigned to the device
owning their x-slab (host-side grouping, padded to the max per-slab
count with zero-flux no-ops).  Spatially clustered catalogs therefore
load-imbalance; the source-parallel replicated mode
(`make_parallel_iteration`) remains the right choice for small grids
with few, clustered sources, and this mode for large grids.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..state import GridState
from ..sweep.global_pass import global_chemistry_pass
from ..sweep.pyramid_sweep import trace_centered
from ..sweep.source_sweep import RateGrids
from .sharding import AXIS, ParallelConfig


# ---------------------------------------------------------------------------
# halo exchange primitives (periodic, multi-hop when H > S)
# ---------------------------------------------------------------------------

def _perm(k, D):
    """ppermute pairs sending device d's value to device d+k (mod D),
    i.e. every device *receives from* d-k."""
    return [(d, (d + k) % D) for d in range(D)]


def exchange_slab_halo(slab, H, axis_name=AXIS):
    """(S, ...) local x-slab -> (S+2H, ...) with H halo planes from
    each periodic neighbor, via lax.ppermute (multi-hop if H > S)."""
    S = slab.shape[0]
    D = jax.lax.axis_size(axis_name)
    if H <= S:
        left = jax.lax.ppermute(slab[S - H:], axis_name, _perm(1, D))
        right = jax.lax.ppermute(slab[:H], axis_name, _perm(-1, D))
    else:
        hops = -(-H // S)
        parts_l = [jax.lax.ppermute(slab, axis_name, _perm(k, D))
                   for k in range(hops, 0, -1)]       # slabs d-hops..d-1
        left = jnp.concatenate(parts_l, axis=0)[-H:]
        parts_r = [jax.lax.ppermute(slab, axis_name, _perm(-k, D))
                   for k in range(1, hops + 1)]       # slabs d+1..d+hops
        right = jnp.concatenate(parts_r, axis=0)[:H]
    return jnp.concatenate([left, slab, right], axis=0)


def fold_slab_halo(core, H, axis_name=AXIS):
    """Inverse of exchange_slab_halo for accumulands: (S+2H, ...) ->
    (S, ...), ppermuting each halo chunk back to its owning device and
    adding it there (the reverse boundary exchange)."""
    S = core.shape[0] - 2 * H
    D = jax.lax.axis_size(axis_name)
    local = core[H:H + S]
    if H <= S:
        # my left chunk covers the tail planes of device d-1; receive
        # the symmetric chunk from d+1 and add it into my tail
        recv_l = jax.lax.ppermute(core[:H], axis_name, _perm(-1, D))
        local = local.at[S - H:].add(recv_l)
        recv_r = jax.lax.ppermute(core[S + H:], axis_name, _perm(1, D))
        local = local.at[:H].add(recv_r)
    else:
        hops = -(-H // S)
        pad = hops * S
        zeros = jnp.zeros((pad,) + core.shape[1:], core.dtype)
        lpad = zeros.at[pad - H:].set(core[:H])       # slabs d-hops..d-1
        rpad = zeros.at[:H].set(core[S + H:])         # slabs d+1..d+hops
        for j in range(hops):
            # lpad piece j belongs to device d-hops+j: send it there,
            # meaning I receive the matching piece from d+hops-j
            local = local + jax.lax.ppermute(
                lpad[j * S:(j + 1) * S], axis_name, _perm(-(hops - j), D))
            local = local + jax.lax.ppermute(
                rpad[j * S:(j + 1) * S], axis_name, _perm(j + 1, D))
    return local


def _cyclic_pad(x, H, axis):
    lo = jax.lax.slice_in_dim(x, x.shape[axis] - H, x.shape[axis],
                              axis=axis)
    hi = jax.lax.slice_in_dim(x, 0, H, axis=axis)
    return jnp.concatenate([lo, x, hi], axis=axis)


def _fold_cyclic(x, H, axis):
    """Inverse of _cyclic_pad for accumulands: wrap the pads back."""
    Msz = x.shape[axis] - 2 * H
    core = jax.lax.slice_in_dim(x, H, H + Msz, axis=axis)
    lo = jax.lax.slice_in_dim(x, 0, H, axis=axis)          # global tail
    hi = jax.lax.slice_in_dim(x, H + Msz, Msz + 2 * H, axis=axis)
    idx_tail = [slice(None)] * x.ndim
    idx_tail[axis] = slice(Msz - H, Msz)
    core = core.at[tuple(idx_tail)].add(lo)
    idx_head = [slice(None)] * x.ndim
    idx_head[axis] = slice(0, H)
    return core.at[tuple(idx_head)].add(hi)


# ---------------------------------------------------------------------------
# source assignment
# ---------------------------------------------------------------------------

def group_sources_by_slab(srcpos, nflux, mesh: int, n_dev: int):
    """Assign each source to the device owning its x-slab; pad each
    group to the max per-slab count with zero-flux no-ops.

    Returns ((D*K, 3) int32 positions, (D*K, 3) fluxes) laid out so a
    leading-axis PartitionSpec gives device d exactly its K sources.
    The static per-slab padding replaces the reference's master-slave
    dynamic queue (master_slave.F90:124-227) -- deterministic and
    SPMD-friendly, at the price of idling on clustered catalogs.
    """
    srcpos = np.asarray(srcpos)
    nflux = np.asarray(nflux)
    S = mesh // n_dev
    owner = (srcpos[:, 0].astype(np.int64) // S).astype(np.int64)
    counts = np.bincount(owner, minlength=n_dev)
    K = max(int(counts.max()) if counts.size else 1, 1)
    sp = np.zeros((n_dev, K, 3), dtype=np.int32)
    nf = np.zeros((n_dev, K, nflux.shape[1]), dtype=nflux.dtype)
    fill = np.zeros(n_dev, dtype=np.int64)
    for i in range(srcpos.shape[0]):
        d = int(owner[i])
        sp[d, fill[d]] = srcpos[i]
        nf[d, fill[d]] = nflux[i]
        fill[d] += 1
    return sp.reshape(n_dev * K, 3), nf.reshape(n_dev * K, -1)


def shard_state_slabs(state: GridState, mesh) -> GridState:
    """Place every state field x-slab-sharded over the device mesh."""
    if state.clumping.ndim == 0:
        state = state._replace(clumping=jnp.broadcast_to(
            state.clumping, state.ndens.shape))
    sh = NamedSharding(mesh, P(AXIS))
    return jax.device_put(state, sh)


# ---------------------------------------------------------------------------
# the sharded iteration
# ---------------------------------------------------------------------------

def max_domain_radius(mesh: int) -> int:
    """Largest trace radius whose window fits the mesh without
    self-overlap (window Mw = 2r+2 <= mesh)."""
    return (mesh - 2) // 2


def make_domain_iteration(pcfg: ParallelConfig, radius: int):
    """One jitted grid-sharded {halo exchange + windowed pyramid sweep
    + reverse rate exchange + local chemistry} iteration.

    `radius` (static) is the subbox trace radius; the halo width is
    radius+1.  All grid-sized arrays stay sharded; per-step traced
    scalars (`dr`, `vol_over_scale`, `cosmo_cool_factor`) follow the
    single-chip path's no-recompile contract.
    """
    cfg = pcfg.cfg
    mesh = pcfg.mesh
    D = mesh.devices.size
    M = cfg.sweep.mesh
    if M % D != 0:
        raise ValueError(f"mesh {M} not divisible by {D} devices")
    S = M // D
    Rw = int(radius)
    if Rw < 1 or 2 * Rw + 2 > M:
        raise ValueError(
            f"radius {Rw} outside [1, {max_domain_radius(M)}] for "
            f"mesh {M} (window must fit the box)")
    H = Rw + 1
    Mw = 2 * Rw + 2

    def _step_shard(state: GridState, srcpos, nflux, lls_grid, dt, dr,
                    vol_over_scale, ccf):
        dtype = state.ndens.dtype
        eps = cfg.sweep.epsilon
        chans = [state.ndens,
                 jnp.maximum(state.h_av0, eps),
                 jnp.maximum(state.h_av1, eps),
                 jnp.maximum(state.he_av0, eps),
                 jnp.maximum(state.he_av1, eps)]
        if lls_grid is not None:
            chans.append(lls_grid)
        C = len(chans)
        fl = jnp.stack(chans, axis=-1).reshape(S, M, M, C)

        # field halo exchange (the boundary-plane communication)
        pf = exchange_slab_halo(fl, H)
        pf = _cyclic_pad(pf, H, 1)
        pf = _cyclic_pad(pf, H, 2)

        x0 = jax.lax.axis_index(AXIS).astype(jnp.int32) * S

        tie = jnp.asarray(nflux, dtype=dtype).ravel()[0] * 0.0
        rc0 = jnp.zeros((S + 2 * H, M + 2 * H, M + 2 * H, 4),
                        dtype=dtype) + tie
        pl0 = jnp.zeros((), dtype=dtype) + tie

        def one_source(carry, sn):
            rc, pl, lls = carry
            sp, nf = sn
            start = (sp[0] - x0 + (H - Rw), sp[1] + (H - Rw),
                     sp[2] + (H - Rw), jnp.int32(0))
            win = jax.lax.dynamic_slice(pf, start, (Mw, Mw, Mw, C))
            cube, p, l = trace_centered(cfg.sweep, win, nf, radius=Rw,
                                        dr=dr,
                                        vol_over_scale=vol_over_scale)
            live = jnp.any(nf > 0.0)
            cube = jnp.where(live, cube, jnp.zeros_like(cube))
            patch = jax.lax.dynamic_slice(rc, start, (Mw, Mw, Mw, 4))
            rc = jax.lax.dynamic_update_slice(rc, patch + cube, start)
            pl = pl + jnp.where(live, p, 0.0)
            lls = lls + jnp.where(live, l, 0.0)
            return (rc, pl, lls), None

        (rc, pl, lls), _ = jax.lax.scan(one_source, (rc0, pl0, pl0),
                                        (srcpos, nflux))

        # reverse exchange: fold the rate halos back onto their owners
        rc = _fold_cyclic(rc, H, 1)
        rc = _fold_cyclic(rc, H, 2)
        rc = fold_slab_halo(rc, H)
        rc = rc.reshape(S * M * M, 4)
        pl = jax.lax.psum(pl, AXIS)
        lls = jax.lax.psum(lls, AXIS)

        rates = RateGrids(phih=rc[:, 0], phihe0=rc[:, 1],
                          phihe1=rc[:, 2], phiheat=rc[:, 3],
                          photon_loss=pl, lls_loss=lls)
        new_state, conv = global_chemistry_pass(cfg.chem, state, rates,
                                                dt, ccf)
        conv = jax.lax.psum(conv, AXIS)
        return new_state, conv, pl, lls

    def _wrap(with_lls):
        in_specs = (P(AXIS), P(AXIS), P(AXIS),
                    P(AXIS) if with_lls else None,
                    P(), P(), P(), P())
        return partial(shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(AXIS), P(), P(), P()))(_step_shard)

    shard_plain = _wrap(False)
    shard_lls = _wrap(True)

    @jax.jit
    def iteration(state: GridState, srcpos, nflux, dt, dr=None,
                  vol_over_scale=None, cosmo_cool_factor=None,
                  lls_grid=None):
        dtype = state.ndens.dtype
        if dr is None:
            dr = jnp.asarray(cfg.sweep.dr, dtype=dtype)
            vol_over_scale = jnp.asarray(
                cfg.sweep.vol / cfg.sweep.flux_scale, dtype=dtype)
        if cosmo_cool_factor is None:
            cosmo_cool_factor = jnp.asarray(cfg.chem.cosmo_cool_factor,
                                            dtype=dtype)
        st = state
        if st.clumping.ndim == 0:
            st = st._replace(clumping=jnp.broadcast_to(
                st.clumping, st.ndens.shape))
        fn = shard_plain if lls_grid is None else shard_lls
        return fn(st, srcpos, nflux, lls_grid, dt, dr, vol_over_scale,
                  cosmo_cool_factor)

    return iteration


def _domain_radii(cfg):
    """The dyadic subbox ladder clipped to radii whose window fits."""
    from ..sweep.evolve3d import _subbox_radii

    rmax = max_domain_radius(cfg.sweep.mesh)
    radii = [r for r in _subbox_radii(cfg) if r <= rmax]
    if not radii or radii[-1] < rmax:
        radii.append(rmax)
    return radii


def domain_evolve3d(pcfg: ParallelConfig, state: GridState, srcpos,
                    nflux, dt, radius=None, dr=None,
                    cosmo_cool_factor=None, iteration_cache=None,
                    initial_radius=None, lls_grid=None):
    """Grid-sharded evolve3D: the reference's convergence protocol
    (evolve.F90:147-181) over the domain-decomposed sweep, with the
    adaptive expanding subbox (evolve_source.F90:114-144) growing the
    static window ladder.

    `radius` fixes the trace radius (no adaptivity); otherwise the
    dyadic ladder from the single-chip path is used, capped at the
    largest window that fits the box.
    """
    from ..state import begin_timestep, finish_timestep
    from ..sweep.evolve3d import Evolve3DStats, _scaled_source_strength

    cfg = pcfg.cfg
    n_dev = pcfg.mesh.devices.size
    sp, nf = group_sources_by_slab(srcpos, nflux, cfg.sweep.mesh, n_dev)
    sp = jnp.asarray(sp)
    nf = jnp.asarray(nf, dtype=state.ndens.dtype)

    if iteration_cache is None:
        iteration_cache = {}

    def iteration_at(r):
        if r not in iteration_cache:
            iteration_cache[r] = make_domain_iteration(pcfg, r)
        return iteration_cache[r]

    adaptive = radius is None and cfg.use_subbox
    if adaptive:
        radii = _domain_radii(cfg)
        total_strength = _scaled_source_strength(cfg.sweep, nflux)
        loss_wall = cfg.min_fraction_of_photons * max(total_strength,
                                                      1e-300)
        r_idx = 0
        if initial_radius is not None:
            while (r_idx + 1 < len(radii)
                   and radii[r_idx] < initial_radius):
                r_idx += 1
    else:
        radii = [radius if radius is not None
                 else max_domain_radius(cfg.sweep.mesh)]
        r_idx = 0

    n = state.mesh3
    num_src = int(np.sum(np.any(np.asarray(nflux) > 0, axis=1)))
    conv_criterion = min(int(cfg.convergence_fraction * n),
                         max(num_src, 1))

    state = begin_timestep(state)
    conv_flag, niter, ploss, lls_loss = n, 0, 0.0, 0.0
    while True:
        if conv_flag < conv_criterion and niter > 1:
            break
        if niter > cfg.max_iterations:
            break
        niter += 1
        kw = {}
        if dr is not None:
            drf = float(dr)
            kw = {"dr": jnp.asarray(drf),
                  "vol_over_scale": jnp.asarray(
                      drf ** 3 / cfg.sweep.flux_scale)}
        if cosmo_cool_factor is not None:
            kw["cosmo_cool_factor"] = jnp.asarray(
                float(cosmo_cool_factor))
        if lls_grid is not None:
            kw["lls_grid"] = lls_grid
        while True:
            out = iteration_at(radii[r_idx])(state, sp, nf, dt, **kw)
            if (not adaptive or r_idx + 1 >= len(radii)
                    or float(out[2]) <= loss_wall):
                break
            r_idx += 1
        state, conv_dev, ploss_dev, lls_dev = out
        conv_flag = int(conv_dev)
        ploss = float(ploss_dev)
        lls_loss = float(lls_dev)

    state = finish_timestep(state)
    return state, Evolve3DStats(n_iterations=niter, conv_flag=conv_flag,
                                photon_loss=ploss,
                                subbox_radius=radii[r_idx],
                                lls_loss=lls_loss)
