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

Per-device memory is dominated by the halo-extended field and rate
slabs, ``(S + 2H) * (M + 2H)^2 * (C + 4)`` elements with
``S = M/D`` and ``H ~ radius + 1`` -- i.e. ``O(mesh^3/D + H*mesh^2)``
for small radii, so the framework scales past single-chip HBM, which
the reference never could.  At large radii the halo extension
dominates: at the full periodic radius H ~ M and the slabs cost
~19 M^3 * C per device -- MORE than plain replication.  The adaptive
ladder in `domain_evolve3d` is therefore memory-capped by default at
the last rung cheaper than the replicated source-parallel engine
(`domain_memory_elements` vs `replicated_memory_elements`); photons
still escaping at the capped radius are accounted as photon_loss,
exactly like the reference's `max_subbox` wall
(c2ray_parameters.f90:52-56, evolve_source.F90:133-144).  Runs that
need the full-radius trace should use the replicated source-parallel
mode (`make_parallel_iteration`), which holds it by construction.

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

def _pack_groups(srcpos, nflux, assign, n_dev, mesh):
    """Lay sources out as (D*K, 3) blocks with x replaced by the
    *slab-local offset* x - d*S (may be negative for borrowed
    sources); pad each device's block to K with zero-flux no-ops."""
    S = mesh // n_dev
    counts = np.bincount(assign, minlength=n_dev)
    K = max(int(counts.max()) if counts.size else 1, 1)
    sp = np.zeros((n_dev, K, 3), dtype=np.int32)
    nf = np.zeros((n_dev, K, nflux.shape[1]), dtype=nflux.dtype)
    fill = np.zeros(n_dev, dtype=np.int64)
    half = mesh // 2
    for i in range(srcpos.shape[0]):
        d = int(assign[i])
        if n_dev == 1:
            # S == mesh: the slab is the whole grid, so the absolute
            # coordinate is the correct (non-negative) window offset;
            # the centered fold would go negative for x >= mesh/2 and
            # XLA's dynamic_slice clamp would silently misalign the
            # trace window
            off = int(srcpos[i, 0])
        else:
            # centered periodic offset relative to the slab start
            off = (int(srcpos[i, 0]) - d * S + half) % mesh - half
        sp[d, fill[d]] = (off, srcpos[i, 1], srcpos[i, 2])
        nf[d, fill[d]] = nflux[i]
        fill[d] += 1
    return sp.reshape(n_dev * K, 3), nf.reshape(n_dev * K, -1)


def group_sources_by_slab(srcpos, nflux, mesh: int, n_dev: int):
    """Assign each source to the device owning its x-slab; pad each
    group to the max per-slab count with zero-flux no-ops.

    Returns ((D*K, 3) int32, (D*K, 3) fluxes) laid out so a leading-axis
    PartitionSpec gives device d exactly its K sources; column 0 holds
    the slab-local x offset (in [0, S) for owner assignment).  Padded
    zero-flux entries are skipped by a `lax.cond` inside the sweep, so
    they cost no trace work.
    """
    srcpos = np.asarray(srcpos)
    nflux = np.asarray(nflux)
    S = mesh // n_dev
    owner = (srcpos[:, 0].astype(np.int64) // S).astype(np.int64)
    return _pack_groups(srcpos, nflux, owner, n_dev, mesh)


def group_sources_balanced(srcpos, nflux, mesh: int, n_dev: int,
                           extra_halo: int):
    """Cost-balanced static source assignment (the SPMD replacement for
    the reference's master-slave dynamic queue,
    master_slave.F90:124-227).

    With `extra_halo = E` extra exchanged boundary planes, device d can
    trace any source whose slab-local offset lies in [-(E+1), S+E-1]
    (its window then still fits the halo-extended slab).  Each source
    goes to the least-loaded eligible device (ties to the owner), so a
    clustered catalog spreads over min(n_dev, 2*ceil(E/S)+1) devices
    instead of idling all but one.  Padded no-ops are `lax.cond`-skipped
    in the sweep, so per-device wall time tracks the real max load.
    """
    srcpos = np.asarray(srcpos)
    nflux = np.asarray(nflux)
    S = mesh // n_dev
    E = int(extra_halo)
    half = mesh // 2
    load = np.zeros(n_dev, dtype=np.int64)
    assign = np.zeros(srcpos.shape[0], dtype=np.int64)
    # process in x order for determinism
    order = np.argsort(srcpos[:, 0], kind="stable")
    for i in order:
        x = int(srcpos[i, 0])
        owner = x // S
        best, best_load = owner, load[owner]
        for d in range(n_dev):
            off = (x - d * S + half) % mesh - half
            if -(E + 1) <= off <= S + E - 1 and load[d] < best_load:
                best, best_load = d, load[d]
        assign[i] = best
        load[best] += 1
    return _pack_groups(srcpos, nflux, assign, n_dev, mesh)


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
    """Largest supported trace radius: mesh/2 is the full periodic
    extent (+M/2 / -(M/2-1), evolve_source.F90:103-109); the window is
    then the whole torus (Mw = M) and the domain sweep reproduces the
    replicated engine exactly."""
    return mesh // 2


def _window_geometry(M: int, radius: int, extra_halo: int = 0):
    """(Mw, Rb, H) for a trace radius (the same arithmetic as
    make_domain_iteration)."""
    Mw = min(2 * radius + 2, M)
    Rb = min(radius, Mw // 2 - 1)
    H = Mw - Rb - 1 + int(extra_halo)
    return Mw, Rb, H


def domain_memory_elements(M: int, D: int, radius: int,
                           extra_halo: int = 0,
                           n_channels: int = 5) -> int:
    """Per-device element count of the domain iteration's dominant live
    arrays at a given trace radius: the halo-extended field slab
    (S+2H, M+2H, M+2H, C), the halo-extended rate accumulator (same
    extents, 4 channels), one trace window (Mw^3 * (C+4)), and the
    ~20-field grid state slab.  This is the memory model behind the
    adaptive ladder's cap (see the module docstring): at small radii it
    is ~M^3*(C+4)/D + O(H*M^2), at the full radius it is ~19*M^3*(C+4)
    -- far beyond replication."""
    S = M // D
    Mw, _, H = _window_geometry(M, radius, extra_halo)
    halo_extended = (S + 2 * H) * (M + 2 * H) ** 2 * (n_channels + 4)
    window = Mw ** 3 * (n_channels + 4)
    state = 20 * M ** 3 // D
    return halo_extended + window + state


def replicated_memory_elements(M: int, n_channels: int = 5) -> int:
    """Per-device element count of the replicated source-parallel
    engine: full grid state (~20 fields), full rate grids (4), the
    stacked sweep field (C), and the full-extent trace working set
    (~(C+4) M^3 in the pyramid engine)."""
    return (20 + 4 + n_channels) * M ** 3 + (n_channels + 4) * M ** 3


def make_domain_iteration(pcfg: ParallelConfig, radius: int,
                          extra_halo: int = 0, return_rates: bool = False,
                          split_chem: bool = None):
    """One jitted grid-sharded {halo exchange + windowed pyramid sweep
    + reverse rate exchange + local chemistry} iteration.

    `split_chem` lifts the chemistry fixed-point loop out of the
    sharded program: the sweep + halo exchanges stay one jitted
    shard_map producing slab-sharded rates, then the host drives one
    jitted cell-sharded chemistry trip per iteration (global_pass
    host_loop) -- the state is already P(AXIS)-sharded, so the
    elementwise chemistry preserves the slab layout without shard_map.
    REQUIRED for heating on real TPUs (the round-3 bisected XLA:TPU
    nested-loop fault; see _do_chemistry_global).  Auto: on for
    heating on a TPU backend.

    `radius` (static) is the subbox trace radius, up to M/2 = the full
    periodic trace (window of M planes, extents +M/2 / -(M/2-1) like
    the replicated engine).  All grid-sized arrays stay sharded;
    per-step traced scalars (`dr`, `vol_over_scale`,
    `cosmo_cool_factor`) follow the single-chip path's no-recompile
    contract.

    `extra_halo` widens the exchanged halo by E planes so devices can
    trace sources borrowed from neighbors (group_sources_balanced);
    `return_rates` additionally returns the slab-sharded RateGrids for
    the mid-iteration checkpoint path (evolve.F90:233-275).

    Source positions' column 0 must be the slab-local x offset
    (as produced by group_sources_by_slab / group_sources_balanced).
    """
    cfg = pcfg.cfg
    mesh = pcfg.mesh
    if split_chem is None:
        split_chem = (not cfg.chem.isothermal
                      and jax.default_backend() == "tpu")
    D = mesh.devices.size
    M = cfg.sweep.mesh
    if M % D != 0:
        raise ValueError(f"mesh {M} not divisible by {D} devices")
    S = M // D
    Rw = int(radius)
    if Rw < 1 or Rw > M // 2:
        raise ValueError(
            f"radius {Rw} outside [1, {max_domain_radius(M)}] for "
            f"mesh {M}")
    # window holds extents +Rw / -Rb around the source; at the full
    # radius the backward extent drops one plane (the reference's
    # periodic -(M/2-1), evolve_source.F90:103-109) and Mw == M
    Mw = min(2 * Rw + 2, M)
    Rb = min(Rw, Mw // 2 - 1)
    H = Mw - Rb - 1 + int(extra_halo)

    def _trace_shard(state: GridState, srcpos, nflux, lls_grid, dr,
                     vol_over_scale):
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

        tie = jnp.asarray(nflux, dtype=dtype).ravel()[0] * 0.0
        rc0 = jnp.zeros((S + 2 * H, M + 2 * H, M + 2 * H, 4),
                        dtype=dtype) + tie
        pl0 = jnp.zeros((), dtype=dtype) + tie

        def one_source(carry, sn):
            rc, pl, lls = carry
            sp, nf = sn
            # sp[0] is the slab-local x offset (window start may dip
            # into the halo for borrowed sources)
            start = (sp[0] + (H - Rb), sp[1] + (H - Rb),
                     sp[2] + (H - Rb), jnp.int32(0))

            def traced(_):
                win = jax.lax.dynamic_slice(pf, start, (Mw, Mw, Mw, C))
                return trace_centered(cfg.sweep, win, nf, radius=Rw,
                                      dr=dr,
                                      vol_over_scale=vol_over_scale)

            def skipped(_):
                # `+ tie` marks the zeros as device-varying so both
                # cond branches agree under shard_map's vma typing
                return (jnp.zeros((Mw, Mw, Mw, 4), dtype=dtype) + tie,
                        jnp.zeros((), dtype=dtype) + tie,
                        jnp.zeros((), dtype=dtype) + tie)

            # padded zero-flux no-ops skip the whole trace (the load
            # balancer's idle slots cost no work)
            live = jnp.any(nf > 0.0)
            cube, p, l = jax.lax.cond(live, traced, skipped, None)
            patch = jax.lax.dynamic_slice(rc, start, (Mw, Mw, Mw, 4))
            rc = jax.lax.dynamic_update_slice(rc, patch + cube, start)
            pl = pl + p
            lls = lls + l
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

        return RateGrids(phih=rc[:, 0], phihe0=rc[:, 1],
                         phihe1=rc[:, 2], phiheat=rc[:, 3],
                         photon_loss=pl, lls_loss=lls)

    def _step_shard(state: GridState, srcpos, nflux, lls_grid, dt, dr,
                    vol_over_scale, ccf):
        rates = _trace_shard(state, srcpos, nflux, lls_grid, dr,
                             vol_over_scale)
        new_state, conv = global_chemistry_pass(cfg.chem, state, rates,
                                                dt, ccf)
        conv = jax.lax.psum(conv, AXIS)
        if return_rates:
            return new_state, conv, rates.photon_loss, rates.lls_loss, \
                rates
        return new_state, conv, rates.photon_loss, rates.lls_loss

    rates_spec = RateGrids(phih=P(AXIS), phihe0=P(AXIS),
                           phihe1=P(AXIS), phiheat=P(AXIS),
                           photon_loss=P(), lls_loss=P())

    def _wrap(with_lls):
        in_specs = (P(AXIS), P(AXIS), P(AXIS),
                    P(AXIS) if with_lls else None,
                    P(), P(), P(), P())
        out_specs = (P(AXIS), P(), P(), P())
        if return_rates:
            out_specs = out_specs + (rates_spec,)
        return partial(shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs)(_step_shard)

    def _wrap_trace(with_lls):
        in_specs = (P(AXIS), P(AXIS), P(AXIS),
                    P(AXIS) if with_lls else None, P(), P())
        return partial(shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=rates_spec)(_trace_shard)

    def _defaults(state, dr, vol_over_scale, cosmo_cool_factor):
        dtype = state.ndens.dtype
        if dr is None:
            dr = jnp.asarray(cfg.sweep.dr, dtype=dtype)
            vol_over_scale = jnp.asarray(
                cfg.sweep.vol / cfg.sweep.flux_scale, dtype=dtype)
        if cosmo_cool_factor is None:
            cosmo_cool_factor = jnp.asarray(cfg.chem.cosmo_cool_factor,
                                            dtype=dtype)
        return dr, vol_over_scale, cosmo_cool_factor

    if split_chem:
        trace_plain = jax.jit(_wrap_trace(False))
        trace_lls = jax.jit(_wrap_trace(True))

        def iteration(state: GridState, srcpos, nflux, dt, dr=None,
                      vol_over_scale=None, cosmo_cool_factor=None,
                      lls_grid=None):
            dr, vol_over_scale, ccf = _defaults(
                state, dr, vol_over_scale, cosmo_cool_factor)
            st = state
            if st.clumping.ndim == 0:
                st = st._replace(clumping=jax.device_put(
                    jnp.broadcast_to(st.clumping, st.ndens.shape),
                    NamedSharding(mesh, P(AXIS))))
            fn = trace_plain if lls_grid is None else trace_lls
            rates = fn(st, srcpos, nflux, lls_grid, dr, vol_over_scale)
            # host-driven chemistry on the slab-sharded state: the
            # elementwise trips keep every array P(AXIS)-sharded
            new_state, conv = global_chemistry_pass(
                cfg.chem, st, rates, dt, ccf, host_loop=True)
            if return_rates:
                return (new_state, conv, rates.photon_loss,
                        rates.lls_loss, rates)
            return new_state, conv, rates.photon_loss, rates.lls_loss

        return iteration

    shard_plain = _wrap(False)
    shard_lls = _wrap(True)

    @jax.jit
    def iteration(state: GridState, srcpos, nflux, dt, dr=None,
                  vol_over_scale=None, cosmo_cool_factor=None,
                  lls_grid=None):
        dr, vol_over_scale, cosmo_cool_factor = _defaults(
            state, dr, vol_over_scale, cosmo_cool_factor)
        st = state
        if st.clumping.ndim == 0:
            st = st._replace(clumping=jnp.broadcast_to(
                st.clumping, st.ndens.shape))
        fn = shard_plain if lls_grid is None else shard_lls
        return fn(st, srcpos, nflux, lls_grid, dt, dr, vol_over_scale,
                  cosmo_cool_factor)

    return iteration


def _domain_radii(cfg, n_dev: int = 1, extra_halo: int = 0,
                  cap_memory: bool = True, n_channels: int = 5):
    """The dyadic subbox ladder for the domain mode.

    With `cap_memory` (the default) the ladder stops at the last rung
    whose per-device memory (`domain_memory_elements`) stays below the
    replicated engine's (`replicated_memory_elements`): beyond that the
    halo extension costs MORE than replication, defeating the mode's
    purpose, and a 512^3/8 run escalating to the full radius would OOM
    long before the replicated engine.  Photons still escaping at the
    capped radius are accounted as photon_loss -- the reference's own
    `max_subbox` wall behavior (evolve_source.F90:133-144).  Pass
    `cap_memory=False` (or an explicit `radius`) to force larger
    windows up to the full periodic extent."""
    from ..sweep.evolve3d import _subbox_radii

    M = cfg.sweep.mesh
    rmax = max_domain_radius(M)
    radii = [r for r in _subbox_radii(cfg) if r <= rmax]
    if not radii or radii[-1] < rmax:
        radii.append(rmax)
    if cap_memory and n_dev > 1:
        budget = replicated_memory_elements(M, n_channels)
        capped = [r for r in radii
                  if domain_memory_elements(M, n_dev, r, extra_halo,
                                            n_channels) <= budget]
        if capped:
            capped_below = len(capped) < len(radii)
            radii = capped
        else:
            capped_below = True
            radii = radii[:1]
        if capped_below:
            import warnings
            warnings.warn(
                "domain-mode subbox ladder memory-capped at radius "
                f"{radii[-1]} (< full periodic {rmax}): photons "
                "escaping the capped window are booked as photon_loss "
                "(the reference's max_subbox wall, "
                "evolve_source.F90:133-144); pass cap_memory=False to "
                "force the full trace", stacklevel=3)
    return radii


def domain_evolve3d(pcfg: ParallelConfig, state: GridState, srcpos,
                    nflux, dt, radius=None, dr=None,
                    cosmo_cool_factor=None, iteration_cache=None,
                    initial_radius=None, lls_grid=None,
                    balance_halo: int = 0,
                    dump_dir=None, dump_interval_s=900.0,
                    start_from_dump=False, split_chem=None,
                    cap_memory: bool = True):
    """Grid-sharded evolve3D: the reference's convergence protocol
    (evolve.F90:147-181) over the domain-decomposed sweep, with the
    adaptive expanding subbox (evolve_source.F90:114-144) growing the
    static window ladder up to the full periodic trace (radius M/2).

    `radius` fixes the trace radius (no adaptivity); otherwise the
    single-chip dyadic ladder is used, ending at the full extent.

    `balance_halo = E` exchanges E extra halo planes and assigns
    sources cost-balanced over eligible devices
    (group_sources_balanced) instead of strictly by owner slab -- the
    SPMD answer to the reference's master-slave queue for clustered
    catalogs (master_slave.F90:124-227).

    `dump_dir` enables the reference's mid-iteration checkpoints
    (evolve.F90:199-212): every `dump_interval_s` wall seconds the
    pre-iteration state + the iteration's (gathered) rate grids are
    written to alternating iterdump slots; `start_from_dump=True`
    resumes mid-timestep (evolve.F90:279-367), re-sharding the restored
    state over the device mesh.

    `cap_memory` (default True) stops the adaptive ladder at the last
    rung whose per-device memory stays below the replicated engine's
    (see _domain_radii); photons escaping the capped window count as
    photon_loss, like the reference's max_subbox wall.
    """
    import time as _time

    from ..state import begin_timestep, finish_timestep
    from ..sweep.evolve3d import Evolve3DStats, _scaled_source_strength

    cfg = pcfg.cfg
    n_dev = pcfg.mesh.devices.size
    if balance_halo > 0:
        sp, nf = group_sources_balanced(srcpos, nflux, cfg.sweep.mesh,
                                        n_dev, balance_halo)
    else:
        sp, nf = group_sources_by_slab(srcpos, nflux, cfg.sweep.mesh,
                                       n_dev)
    sp = jnp.asarray(sp)
    nf = jnp.asarray(nf, dtype=state.ndens.dtype)

    if iteration_cache is None:
        iteration_cache = {}
    want_rates = dump_dir is not None

    def iteration_at(r):
        key = (r, balance_halo, want_rates, split_chem)
        if key not in iteration_cache:
            iteration_cache[key] = make_domain_iteration(
                pcfg, r, extra_halo=balance_halo,
                return_rates=want_rates, split_chem=split_chem)
        return iteration_cache[key]

    adaptive = radius is None and cfg.use_subbox
    if adaptive:
        radii = _domain_radii(cfg, n_dev=n_dev, extra_halo=balance_halo,
                              cap_memory=cap_memory,
                              n_channels=6 if lls_grid is not None
                              else 5)
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

    resume_niter = 0
    resume_conv = None
    if start_from_dump:
        # mid-timestep resume (evolve.F90:279-367): restore the dumped
        # pre-iteration state + rates, re-apply one chemistry pass on
        # the host arrays, then re-shard over the device mesh
        from ..io.checkpoint import load_iterdump
        from ..sweep.source_sweep import RateGrids as _RG

        resume_niter, st_np, rt_np, meta = load_iterdump(
            dump_dir, GridState, _RG, with_meta=True)
        dtype = state.ndens.dtype
        rstate = GridState(*[jnp.asarray(x, dtype=dtype)
                             for x in st_np])
        rrates = _RG(*[None if x is None else jnp.asarray(x, dtype=dtype)
                      for x in rt_np])
        ccf = (None if cosmo_cool_factor is None
               else jnp.asarray(float(cosmo_cool_factor)))
        rstate, conv_dev = global_chemistry_pass(
            cfg.chem, rstate, rrates, jnp.asarray(dt), ccf)
        resume_conv = int(conv_dev)
        state = shard_state_slabs(rstate, pcfg.mesh)
        if adaptive and meta.get("subbox_radius"):
            r_sub = int(meta["subbox_radius"])
            while (r_idx + 1 < len(radii) and radii[r_idx] < r_sub):
                r_idx += 1
    else:
        state = begin_timestep(state)
    conv_flag = n if resume_conv is None else resume_conv
    niter, ploss, lls_loss = resume_niter, 0.0, 0.0
    last_dump = _time.time()
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
        prev_state = state
        while True:
            out = iteration_at(radii[r_idx])(state, sp, nf, dt, **kw)
            if (not adaptive or r_idx + 1 >= len(radii)
                    or float(out[2]) <= loss_wall):
                break
            r_idx += 1
        state, conv_dev, ploss_dev, lls_dev = out[:4]
        conv_flag = int(conv_dev)
        ploss = float(ploss_dev)
        lls_loss = float(lls_dev)

        if want_rates and _time.time() - last_dump >= dump_interval_s:
            # gather the sharded payloads to host and write the same
            # iterdump format as the single-chip path (the dump is
            # mode-portable: a domain run can resume a single-chip
            # dump and vice versa)
            from ..io.checkpoint import save_iterdump

            save_iterdump(dump_dir, niter, prev_state, out[4],
                          subbox_radius=radii[r_idx])
            last_dump = _time.time()

    state = finish_timestep(state)
    return state, Evolve3DStats(n_iterations=niter, conv_flag=conv_flag,
                                photon_loss=ploss,
                                subbox_radius=radii[r_idx],
                                lls_loss=lls_loss)
