"""Pyramid wavefront sweep: each cell rate-evaluated exactly once.

Third-generation transport engine (gen 1: sparse L1 shells with
gathers, `source_sweep.py`; gen 2: dense skewed octants,
`octant_sweep.py`).  The octant engine is gather-free but its skewed
(R+1)^2 plane arrays hold the causal triangle a+b+c=s of each octant,
so ~3x more cells are evaluated than exist -- and the rate evaluation
(band-quadrature exponentials) is VPU-bound, so that 3x is wall-clock.

This engine decomposes the domain by *dominant axis* instead: six
pyramids (+-x, +-y, +-z apexed on the source), exactly the partition
cinterp's dominant-axis selection induces (column_density.f90:107,199,
275, ties z > y > x).  Key facts (provable from the corner stencil):

- a dominant-m cell at |delta_m| = l reads its 4 cinterp corners from
  the grid plane |delta_m| = l-1 only, within |other| <= l;
- corners of an x-pyramid layer-l cell lie in layers <= l-1; a
  y-pyramid layer-l cell additionally reads x-layer-l cells; a
  z-pyramid layer-l cell reads x- and y-layer-l cells.

So a causal ordering is: for l = 1..R, stage x (planes delta_x = +-l),
then stage y, then stage z.  Every stage is a *dense 2D plane window*
(pad/shift/select arithmetic, no gathers) and each grid cell is
computed exactly once.  Windows grow dyadically with the layer bucket,
so total evaluated cells are ~1.3x mesh^3 per source vs the octant
engine's ~3.1x.

Memory design: no 3D state cubes are touched inside the scan.  The
carry holds only the previous layer's three masked stage planes
(every corner a layer-l stage needs lives there or in a same-layer
stage output, stitched in with O(B) row/column pastes), and the rate
planes stream out as stacked scan outputs that are assembled into the
full grid afterwards with static pads/concats -- the octant engine's
unskew-gather and the naive cube `dynamic_update_slice` (which XLA
turns into full-cube copies per step) both disappear.
"""

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from .cinterp import MIN_WEIGHT_DENOM, SQRT2, SQRT3, _SIGMAS
from .source_sweep import RateGrids, SourceFields, SweepConfig, _cell_rates

_ABU = (1.0 - const.abu_he, const.abu_he, const.abu_he)


def _layer_buckets(R: int) -> List[Tuple[int, int]]:
    """Dyadic layer buckets [(lo, hi)] covering 1..R; window size per
    bucket is ~2*hi+1 so early (small) layers use small planes."""
    bounds = []
    b = 4
    while b < min(32, R):
        bounds.append(b)
        b *= 2
    bounds.append(min(32, R))
    b = 48
    while bounds[-1] < R:
        bounds.append(min(b, R))
        b += 16
    out = []
    lo = 1
    for hi in bounds:
        if hi >= lo:
            out.append((lo, hi))
            lo = hi + 1
    return out


def _toward_center(W, o_pos, axis):
    """W shifted one step toward the source along `axis`, per the sign
    of the offset at each position.

    W: (2, B, B, 3); axis in (1, 2); o_pos: static offsets shaped
    broadcast-compatible with W (e.g. (1, B, 1, 1) for axis 1).
    """
    shp = [(0, 0)] * W.ndim
    shp[axis] = (1, 0)
    Wp = jnp.pad(jax.lax.slice_in_dim(W, 0, W.shape[axis] - 1, axis=axis),
                 shp)                                   # value[i] = W[i-1]
    shm = [(0, 0)] * W.ndim
    shm[axis] = (0, 1)
    Wm = jnp.pad(jax.lax.slice_in_dim(W, 1, W.shape[axis], axis=axis),
                 shm)                                   # value[i] = W[i+1]
    return jnp.where(o_pos > 0, Wp, jnp.where(o_pos < 0, Wm, W))


def _get_row(p, i):
    """Row i of p (B, B, C) -> (B, C); traced i."""
    B, C = p.shape[1], p.shape[2]
    return jax.lax.dynamic_slice(p, (i, jnp.int32(0), jnp.int32(0)),
                                 (1, B, C)).reshape(B, C)


def _get_col(p, j):
    B, C = p.shape[0], p.shape[2]
    return jax.lax.dynamic_slice(p, (jnp.int32(0), j, jnp.int32(0)),
                                 (B, 1, C)).reshape(B, C)


def _put_row(p, i, vec, on=None):
    out = jax.lax.dynamic_update_slice(p, vec[None],
                                       (i, jnp.int32(0), jnp.int32(0)))
    return out if on is None else jnp.where(on, out, p)


def _put_col(p, j, vec, on=None):
    out = jax.lax.dynamic_update_slice(p, vec[:, None],
                                       (jnp.int32(0), j, jnp.int32(0)))
    return out if on is None else jnp.where(on, out, p)


def trace_centered(cfg: SweepConfig, f_ctr, nflux, radius: int = None,
                   dr=None, vol_over_scale=None):
    """Pyramid trace of ONE source sitting at the cube center
    ctr = M//2 - 1 on every axis.

    f_ctr: (M, M, M, C) stacked fields [ndens, h_av0, h_av1, he_av0,
    he_av1(, coldensh_LLS)]; C = 6 enables the position-dependent LLS
    opacity (type_of_LLS == 2, evolve_point.F90:177-180).  M is the
    *window* size -- the full mesh for the replicated engine, or the
    subbox window for the domain-decomposed engine
    (parallel/domain.py), which is why this function never wraps
    periodically itself.

    Returns (rate cube (M, M, M, 4), photon_loss, lls_loss); lls_loss
    is the photon count absorbed by the LLS fog
    (total_LLS_loss, photonstatistics.f90:250-267).
    """
    M = f_ctr.shape[0]
    R = M // 2
    Rf = R if radius is None else min(radius, R)
    Rb = (R - 1) if radius is None else min(radius, R - 1)
    ctr = R - 1
    dtype = f_ctr.dtype
    dr = jnp.asarray(cfg.dr if dr is None else dr, dtype=dtype)
    # dr^3/flux_scale must be computed on the host in f64 (the raw
    # cube of a cm-scale proper dr ~1e22 overflows f32); when dr is
    # traced, the caller passes the matching traced scalar
    vol_over_scale = jnp.asarray(
        cfg.vol / cfg.flux_scale if vol_over_scale is None
        else vol_over_scale, dtype=dtype)
    abu = jnp.asarray(_ABU, dtype=dtype)
    sig = jnp.asarray(_SIGMAS, dtype=dtype)

    buckets = _layer_buckets(Rf)
    win = []
    for lo, hi in buckets:
        start = max(0, ctr - hi)
        B = min(M - start, 2 * hi + 1)
        win.append((start, B))

    track = bool(getattr(cfg, "track_band_loss", False))
    if track:
        from ..radiation.quadrature import QuadTables
        if not isinstance(cfg.tables, QuadTables):
            raise ValueError("track_band_loss needs the quadrature "
                             "tables (QuadTables)")
        nb_all = cfg.tables.sigma_HI.shape[0]

    if True:
        nflux = jnp.asarray(nflux, dtype=dtype)
        ncols = jnp.stack([f_ctr[..., 1], f_ctr[..., 3], f_ctr[..., 4]],
                          axis=-1) * f_ctr[..., 0:1]    # neutral densities
        base_cols = ncols * abu                          # (M,M,M,3)
        istate = f_ctr[..., 2]
        lls_cube = f_ctr[..., 5] if f_ctr.shape[-1] > 5 else None

        # source cell's outgoing half-cell columns seed layer 0
        cc0 = base_cols[ctr, ctr, ctr] * (0.5 * dr)      # (3,)

        def make_bucket(start, B):
            ctr_w = ctr - start
            o1 = np.arange(start, start + B, dtype=np.int64) - ctr
            o_u = np.broadcast_to(o1[:, None], (B, B))
            o_v = np.broadcast_to(o1[None, :], (B, B))
            d_u = jnp.asarray(np.abs(o_u), dtype=dtype)
            d_v = jnp.asarray(np.abs(o_v), dtype=dtype)
            o_u4 = jnp.asarray(o1).reshape(1, B, 1, 1)
            o_v4 = jnp.asarray(o1).reshape(1, 1, B, 1)
            in_dom = ((o_u >= -Rb) & (o_u <= Rf)
                      & (o_v >= -Rb) & (o_v <= Rf))
            bnd_uv = ((o_u == Rf) | (o_u == -Rb)
                      | (o_v == Rf) | (o_v == -Rb))
            au = np.abs(o_u)
            av = np.abs(o_v)

            # per-stage field windows (static): planes of base_cols /
            # istate along each axis are sliced dynamically per step
            def axis_plane(cube, m, midx):
                z = jnp.int32
                starts = [z(start), z(start), z(start)]
                sizes = [B, B, B]
                starts[m] = midx.astype(jnp.int32)
                sizes[m] = 1
                if cube.ndim == 4:
                    starts = starts + [z(0)]
                    sizes = sizes + [cube.shape[-1]]
                w = jax.lax.dynamic_slice(cube, starts, sizes)
                return jnp.squeeze(w, axis=m)

            def compute_stage(m, ell, W, lim_u, lim_v):
                """One stage: W = assembled read plane pair (2,B,B,3).
                Returns (cd_new, rates, ploss_contrib, lls_contrib)."""
                lf = ell.astype(dtype)
                idx_f = ctr + ell
                idx_b = ctr - ell
                bcols = jnp.stack([axis_plane(base_cols, m, idx_f),
                                   axis_plane(base_cols, m, idx_b)])
                ist = jnp.stack([axis_plane(istate, m, idx_f),
                                 axis_plane(istate, m, idx_b)])

                valid_uv = ((jnp.abs(jnp.asarray(au)) <= lim_u)
                            & (jnp.abs(jnp.asarray(av)) <= lim_v)
                            & in_dom)
                sign_ok = jnp.stack([ell <= Rf, ell <= Rb])
                valid = valid_uv[None] & sign_ok[:, None, None]

                alam = (lf - 0.5) / lf
                du = 2.0 * jnp.abs(alam * d_u - (d_u - 0.5))
                dv = 2.0 * jnp.abs(alam * d_v - (d_v - 0.5))
                s1 = (1.0 - du) * (1.0 - dv)
                s2 = du * (1.0 - dv)
                s3 = (1.0 - du) * dv
                s4 = du * dv

                C_mu = _toward_center(W, o_u4, 1)
                C_mv = _toward_center(W, o_v4, 2)
                C_mm = _toward_center(C_mu, o_v4, 2)

                def w(sg, c):
                    return sg[..., None] / jnp.maximum(
                        MIN_WEIGHT_DENOM, c * sig)

                w1, w2, w3, w4 = (w(s1, C_mm), w(s2, C_mv),
                                  w(s3, C_mu), w(s4, W))
                wsum = w1 + w2 + w3 + w4
                cd_in = (C_mm * w1 + C_mv * w2 + C_mu * w3 + W * w4) / wsum

                on_diag = (lf == 1.0) & ((d_u == 1.0) | (d_v == 1.0))
                full_diag = (d_u == 1.0) & (d_v == 1.0)
                boost = jnp.where(on_diag,
                                  jnp.where(full_diag, SQRT3, SQRT2),
                                  1.0).astype(dtype)
                cd_in = cd_in * boost[..., None]

                path_units = jnp.sqrt((d_u * d_u + d_v * d_v) / (lf * lf)
                                      + 1.0)
                path = path_units * dr
                # LLS fog column added to the incoming HI column
                # (evolve_point.F90:170-180); position dependent when
                # the fields carry an LLS channel (type_of_LLS == 2)
                if lls_cube is not None:
                    lls_pl = jnp.stack([axis_plane(lls_cube, m, idx_f),
                                        axis_plane(lls_cube, m, idx_b)])
                    lls_add = lls_pl * path_units
                elif cfg.coldensh_LLS > 0.0:
                    lls_add = (cfg.coldensh_LLS
                               * jnp.broadcast_to(path_units,
                                                  (2,) + path_units.shape))
                else:
                    lls_add = None
                if lls_add is not None:
                    cd_in = cd_in.at[..., 0].add(lls_add)

                cd_out = cd_in + bcols * path[..., None]

                dist2 = d_u * d_u + d_v * d_v + lf * lf
                vol_ratio = 4.0 * const.pi * dist2 * path_units
                phi = _cell_rates(cfg, cd_in, cd_out,
                                  vol_ratio * vol_over_scale, nflux, ist)

                live = valid & (cd_in[..., 0] < cfg.max_coldensh)
                fl = live.astype(dtype)
                rates = jnp.stack(
                    [fl * phi.photo_cell_HI / bcols[..., 0],
                     fl * phi.photo_cell_HeI / bcols[..., 1],
                     fl * phi.photo_cell_HeII / bcols[..., 2],
                     fl * phi.heat], axis=-1)

                on_bound = (jnp.asarray(bnd_uv)[None]
                            | jnp.stack([ell == Rf, ell == Rb])[
                                :, None, None])
                pls = jnp.sum(jnp.where(live & on_bound,
                                        phi.photo_out / vol_ratio, 0.0))
                if track:
                    plb = jnp.sum(jnp.where(
                        (live & on_bound)[..., None],
                        phi.photo_out_bands / vol_ratio[..., None],
                        0.0), axis=(0, 1, 2))
                else:
                    plb = None

                # photons absorbed by the LLS fog: grey-opacity loss
                # phi_in * (1 - e^-tau_LLS) (total_LLS_loss,
                # photonstatistics.f90:250-267, evolve_point.F90:277)
                if lls_add is not None:
                    tau_lls = const.sigma_HI_at_ion_freq * lls_add
                    lls = jnp.sum(jnp.where(
                        live,
                        phi.photo_in / vol_ratio * (-jnp.expm1(-tau_lls)),
                        0.0))
                else:
                    lls = jnp.zeros((), dtype=dtype)

                cd_new = jnp.where(valid[..., None], cd_out, 0.0)
                return cd_new, rates, pls, lls, plb

            def step(carry, ell):
                # layer l-1 stage planes (+ per-band loss when tracked)
                Px, Py, Pz, pls, lls = carry[:5]
                plb = carry[5] if track else None
                el32 = ell.astype(jnp.int32)
                jf = ctr_w + el32 - 1     # window row of +(l-1)
                jb = ctr_w - el32 + 1
                rf = ctr_w + el32         # window row of +l
                rb = ctr_w - el32
                bwd_ok = (ell <= Rb)[None, None]

                # --- assemble W_x: plane a=+-(l-1) = Px + y-layer rows
                # + z-layer columns of layer l-1
                W = Px
                for s in (0, 1):
                    arow = jf if s == 0 else jb
                    Ws = W[s]
                    Ws = _put_row(Ws, jf, _get_row(Py[0], arow))
                    Ws = _put_row(Ws, jb, _get_row(Py[1], arow))
                    Ws = _put_col(Ws, jf, _get_row(Pz[0], arow))
                    Ws = _put_col(Ws, jb, _get_row(Pz[1], arow))
                    W = W.at[s].set(Ws)
                cd_x, r_x, p1, l1, b1 = compute_stage(0, ell, W,
                                                      ell - 1, ell - 1)

                # --- W_y: plane b=+-(l-1) = Py + z cols (layer l-1)
                # + x rows (layer l, this step)
                W = Py
                for s in (0, 1):
                    brow = jf if s == 0 else jb
                    Ws = W[s]
                    Ws = _put_col(Ws, jf, _get_col(Pz[0], brow))
                    Ws = _put_col(Ws, jb, _get_col(Pz[1], brow))
                    Ws = _put_row(Ws, rf, _get_row(cd_x[0], brow))
                    Ws = _put_row(Ws, rb, _get_row(cd_x[1], brow),
                                  on=bwd_ok[..., None])
                    W = W.at[s].set(Ws)
                cd_y, r_y, p2, l2, b2 = compute_stage(1, ell, W, ell,
                                                      ell - 1)

                # --- W_z: plane c=+-(l-1) = Pz + x rows + y cols
                # (both layer l, this step)
                W = Pz
                for s in (0, 1):
                    ccol = jf if s == 0 else jb
                    Ws = W[s]
                    Ws = _put_row(Ws, rf, _get_col(cd_x[0], ccol))
                    Ws = _put_row(Ws, rb, _get_col(cd_x[1], ccol),
                                  on=bwd_ok[..., None])
                    Ws = _put_col(Ws, rf, _get_col(cd_y[0], ccol))
                    Ws = _put_col(Ws, rb, _get_col(cd_y[1], ccol),
                                  on=bwd_ok[..., None])
                    W = W.at[s].set(Ws)
                cd_z, r_z, p3, l3, b3 = compute_stage(2, ell, W, ell,
                                                      ell)

                out = (cd_x, cd_y, cd_z, pls + p1 + p2 + p3,
                       lls + l1 + l2 + l3)
                if track:
                    out = out + (plb + b1 + b2 + b3,)
                return (out, (r_x, r_y, r_z))

            return step

        # seed carry: layer-0 "planes" all equal the center plane with
        # only the source cell's half-cell columns
        def seed_planes(B, start):
            ctr_w = ctr - start
            p = jnp.zeros((2, B, B, 3), dtype=dtype)
            return p.at[:, ctr_w, ctr_w].set(cc0)

        ploss = jnp.zeros((), dtype=dtype) + nflux[0] * 0.0
        rate_stacks = []   # per bucket: (r_x, r_y, r_z) stacked over l
        start0, B0 = win[0]
        carry = (seed_planes(B0, start0), seed_planes(B0, start0),
                 seed_planes(B0, start0), ploss, ploss)
        if track:
            carry = carry + (jnp.zeros((nb_all,), dtype=dtype)
                             + nflux[0] * 0.0,)
        for bi, ((lo, hi), (start, B)) in enumerate(zip(buckets, win)):
            if bi > 0:
                # re-embed previous bucket's carry planes in the wider
                # window (static pad)
                pstart, pB = win[bi - 1]
                lpad = pstart - start
                rpad = (start + B) - (pstart + pB)
                grow = lambda p: jnp.pad(
                    p, [(0, 0), (lpad, rpad), (lpad, rpad), (0, 0)])
                carry = (grow(carry[0]), grow(carry[1]),
                         grow(carry[2])) + carry[3:]
            step = make_bucket(start, B)
            carry, ys = jax.lax.scan(
                step, carry, jnp.arange(lo, hi + 1, dtype=jnp.int32))
            rate_stacks.append(ys)
        ploss = carry[3]
        lls_loss = carry[4]
        ploss_bands = carry[5] if track else None

        # --- assemble the rate cube from the stacked plane outputs
        # (static pads/concats only; every cell was written by exactly
        # one stage so the three axis cubes just add)
        def axis_cube(stage_i):
            fwd_parts, bwd_parts = [], []
            for ((lo, hi), (start, B), ys) in zip(buckets, win,
                                                  rate_stacks):
                r = ys[stage_i]                          # (L, 2, B, B, 4)
                pad = [(0, 0), (start, M - start - B),
                       (start, M - start - B), (0, 0)]
                fwd_parts.append(jnp.pad(r[:, 0], pad))
                bwd_parts.append(jnp.pad(r[:, 1], pad))
            fwd = jnp.concatenate(fwd_parts, axis=0)     # layers 1..Rf
            bwd = jnp.concatenate(bwd_parts, axis=0)
            # axis index = ctr - l (l <= Rb; deeper backward planes
            # are masked-zero); zero padding outside the subbox
            neg = jnp.flip(bwd[:Rb], axis=0)             # idx ctr-Rb..
            zc = jnp.zeros((1, M, M, 4), dtype=dtype)
            zlo = jnp.zeros((R - 1 - Rb, M, M, 4), dtype=dtype)
            zhi = jnp.zeros((R - Rf, M, M, 4), dtype=dtype)
            return jnp.concatenate([zlo, neg, zc, fwd, zhi], axis=0)

        cube = axis_cube(0)                              # x: (a, b, c)
        cube = cube + jnp.transpose(axis_cube(1), (1, 0, 2, 3))
        cube = cube + jnp.transpose(axis_cube(2), (1, 2, 0, 3))

        # source-cell rates (evolve_point.F90:140-151)
        zero3 = jnp.zeros(3, dtype=dtype)
        f0 = f_ctr[ctr, ctr, ctr]
        phi0 = _cell_rates(cfg, zero3, cc0, vol_over_scale, nflux, f0[2])
        denom0 = base_cols[ctr, ctr, ctr]
        src_rates = jnp.stack([phi0.photo_cell_HI / denom0[0],
                               phi0.photo_cell_HeI / denom0[1],
                               phi0.photo_cell_HeII / denom0[2],
                               phi0.heat])
        cube = cube.at[ctr, ctr, ctr].set(src_rates)
        if track:
            return cube, ploss, lls_loss, ploss_bands
        return cube, ploss, lls_loss


def stack_sweep_fields(cfg: SweepConfig, fields: SourceFields,
                       lls_grid=None):
    """(M, M, M, C) stacked field cube with the reference's epsilon
    clamps (evolve_point.F90:120-132); C = 6 when a per-cell LLS
    column grid is supplied (set_LLS type 2, mat_ini_test.F90:667-763).
    """
    M = cfg.mesh
    eps = cfg.epsilon
    chans = [fields.ndens, jnp.maximum(fields.h_av0, eps),
             jnp.maximum(fields.h_av1, eps),
             jnp.maximum(fields.he_av0, eps),
             jnp.maximum(fields.he_av1, eps)]
    if lls_grid is not None:
        chans.append(jnp.asarray(lls_grid, dtype=fields.ndens.dtype)
                     .reshape(-1))
    C = len(chans)
    return jnp.stack(chans, axis=-1).reshape(M, M, M, C)


def _source_chunk(cfg: SweepConfig, S: int, M: int,
                  itemsize: int = 4) -> int:
    """Sources vmapped together per scan step.  cfg.source_chunk
    overrides; auto keeps the per-source (M^3, ~10-channel)
    intermediates of a chunk near ~2 GB so the batch fits HBM
    alongside the state and tables.  `itemsize` is the field dtype's
    byte width (4 for the f32 TPU path, 8 for f64 CPU grids)."""
    explicit = getattr(cfg, "source_chunk", 0)
    if explicit:
        return max(1, min(int(explicit), S))
    per_src = M ** 3 * 10 * itemsize
    # budget measured on-chip (round 5): chunk=4 at 256^3 f32 fits a
    # 16 GB v5e alongside the state + tables and runs 38% faster than
    # chunk=2 (tools/profile_256.py); chunk=8 fails to compile
    c = max(1, min(S, (2 ** 32) // per_src))
    if c < S:
        # prefer a divisor of S (no padded no-op traces) unless that
        # would halve the chunk
        for d in range(c, 0, -1):
            if S % d == 0:
                if 2 * d >= c:
                    c = d
                break
    return c


def sweep_pyramid_source_batch(cfg: SweepConfig, fields: SourceFields,
                               srcpos_batch, nflux_batch,
                               radius: int = None, dr=None,
                               vol_over_scale=None,
                               lls_grid=None) -> RateGrids:
    """Dominant-axis pyramid trace of a source batch; same contract as
    `sweep_octant_source_batch` (even cubic mesh, default trace
    extents +R / -(R-1), evolve_source.F90:103-109).

    `radius` (static) restricts the trace to a subbox of +-radius
    cells around each source (the reference's expanding-subbox
    mechanism, evolve_source.F90:114-144): rates outside are zero
    and photons crossing the subbox surface count as photon loss.

    `dr` (traced, optional) overrides cfg.dr: the comoving-expansion
    rescaling changes the proper cell size every timestep
    (cosmo_evol, cosmology.f90:159-202), and passing it as a runtime
    value avoids recompiling the sweep each step.

    `lls_grid` (optional, (mesh^3,)) gives each cell's LLS opacity
    column for the position-dependent LLS model (type 2,
    mat_ini_test.F90:667-763, evolve_point.F90:177-180).
    """
    M = cfg.mesh
    ctr = M // 2 - 1
    n = M**3
    dtype = fields.ndens.dtype
    fstack = stack_sweep_fields(cfg, fields, lls_grid)

    track = bool(getattr(cfg, "track_band_loss", False))

    def one_source(srcpos, nflux):
        shift = (ctr - srcpos[0], ctr - srcpos[1], ctr - srcpos[2])
        f_ctr = jnp.roll(fstack, shift=shift, axis=(0, 1, 2))
        out = trace_centered(
            cfg, f_ctr, nflux, radius=radius, dr=dr,
            vol_over_scale=vol_over_scale)
        cube, ploss, lls_loss = out[:3]
        plb = out[3] if track else jnp.zeros((), dtype=dtype)
        rate_grid = jnp.roll(cube, shift=(srcpos[0] - ctr,
                                          srcpos[1] - ctr,
                                          srcpos[2] - ctr),
                             axis=(0, 1, 2))
        return rate_grid, ploss, lls_loss, plb

    S = srcpos_batch.shape[0]
    chunk = _source_chunk(cfg, S, M,
                          itemsize=np.dtype(dtype).itemsize)
    if chunk >= S:
        # single chunk: the plain vmap program (identical XLA to every
        # prior round -- keeps the persistent compile cache valid)
        rate_grids, plosses, llses, plbs = jax.vmap(one_source)(
            srcpos_batch, nflux_batch)
        live = jnp.any(nflux_batch > 0.0, axis=1)
        rg = jnp.sum(jnp.where(live[:, None, None, None, None],
                               rate_grids, 0.0), axis=0).reshape(n, 4)
        pl = jnp.sum(jnp.where(live, plosses, 0.0))
        ll = jnp.sum(jnp.where(live, llses, 0.0))
        plb = (jnp.sum(jnp.where(live[:, None], plbs, 0.0), axis=0)
               if track else None)
        return RateGrids(phih=rg[:, 0], phihe0=rg[:, 1], phihe1=rg[:, 2],
                         phiheat=rg[:, 3], photon_loss=pl,
                         lls_loss=ll, photon_loss_bands=plb)

    # Large source batches at large meshes: the vmapped per-source
    # intermediates are O(S * M^3 * C) and blow past HBM (measured:
    # 256^3 x 8 sources OOMs at ~26 GB on a 16 GB v5e).  Scan over
    # chunks of `chunk` sources, vmapping within a chunk and
    # accumulating into ONE (M, M, M, 4) rate grid -- memory
    # O(chunk * M^3 * C), numerics identical (the accumulation order
    # over chunks matches the vmap sum's source order).
    pad = (-S) % chunk
    if pad:
        srcpos_batch = jnp.concatenate(
            [srcpos_batch,
             jnp.zeros((pad, 3), srcpos_batch.dtype)], axis=0)
        nflux_batch = jnp.concatenate(
            [nflux_batch,
             jnp.zeros((pad, nflux_batch.shape[1]),
                       nflux_batch.dtype)], axis=0)
    live = jnp.any(nflux_batch > 0.0, axis=1)
    sp_c = srcpos_batch.reshape(-1, chunk, 3)
    nf_c = nflux_batch.reshape(-1, chunk, nflux_batch.shape[1])
    lv_c = live.reshape(-1, chunk)

    def scan_body(carry, xs):
        rg_acc, pl_acc, ll_acc, plb_acc = carry
        sp, nf, lv = xs
        rate_grids, plosses, llses, plbs = jax.vmap(one_source)(sp, nf)
        rg_acc = rg_acc + jnp.sum(
            jnp.where(lv[:, None, None, None, None], rate_grids, 0.0),
            axis=0)
        pl_acc = pl_acc + jnp.sum(jnp.where(lv, plosses, 0.0))
        ll_acc = ll_acc + jnp.sum(jnp.where(lv, llses, 0.0))
        if track:
            plb_acc = plb_acc + jnp.sum(
                jnp.where(lv[:, None], plbs, 0.0), axis=0)
        return (rg_acc, pl_acc, ll_acc, plb_acc), None

    zero = jnp.zeros((), dtype)
    plb0 = (jnp.zeros((cfg.tables.sigma_HI.shape[0],), dtype)
            if track else zero)
    (rg, pl, ll, plb), _ = jax.lax.scan(
        scan_body,
        (jnp.zeros((M, M, M, 4), dtype), zero, zero, plb0),
        (sp_c, nf_c, lv_c))
    rg = rg.reshape(n, 4)
    return RateGrids(phih=rg[:, 0], phihe0=rg[:, 1], phihe1=rg[:, 2],
                     phiheat=rg[:, 3], photon_loss=pl, lls_loss=ll,
                     photon_loss_bands=plb if track else None)
