"""Dense skewed-octant wavefront sweep: the gather-free transport engine.

The second-generation TPU formulation of the short-characteristics sweep
(first generation: `source_sweep.py`, a sparse L1-shell scan whose
per-step corner gathers and rate scatters dominate on TPU).

Key idea: inside one octant (all offsets toward +x,+y,+z of the source)
the causal hyperplane a+b+c = s is a *dense triangular slice* of the
octant cube.  Storing planes as skewed 2D arrays P_s[b, c] (with
a = s-b-c implied), every cinterp corner of every cell is a **shifted
dense slice** of planes s-1, s-2, s-3:

    corner (a-da, b-db, c-dc)  ->  plane s-da-db-dc at [b-db, c-dc]

so the whole sweep is pad/slice/select arithmetic on (R+1)^2 planes --
no gathers, no scatters, no index lists.  The 8 octants and the source
batch are vmapped; grid <-> octant-frame transforms are periodic rolls
+ slices/flips done once per source (the reference's octant
decomposition, evolve_source.F90:149-194, reached the same 8-fold
structure for OpenMP threading).

Face/edge cells shared between octants are computed redundantly (their
values agree: the corner weights toward the unshared side are exactly
zero, column_density.f90:119-122 with du=1) and the final stitch takes
each offset cell from exactly one octant, so no double counting occurs.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from .cinterp import MIN_WEIGHT_DENOM, SQRT2, SQRT3, _SIGMAS
from .source_sweep import RateGrids, SourceFields, SweepConfig, _cell_rates

_ABU = (1.0 - const.abu_he, const.abu_he, const.abu_he)


def _octant_signs():
    """The 8 sign triples; order fixed for the stitch."""
    return [(sx, sy, sz) for sx in (1, -1) for sy in (1, -1)
            for sz in (1, -1)]


def _plane_geometry(R: int, dtype):
    """Static per-plane-position geometry shared by all planes.

    Returns iotas (b, c) of shape (R+1, R+1).
    """
    b = np.ascontiguousarray(
        np.broadcast_to(np.arange(R + 1, dtype=np.int32)[:, None],
                        (R + 1, R + 1)))
    c = np.ascontiguousarray(
        np.broadcast_to(np.arange(R + 1, dtype=np.int32)[None, :],
                        (R + 1, R + 1)))
    # plain numpy: these become embedded constants instead of eager
    # device computations at trace time
    return b, c


def _shift_bc(p, db: int, dc: int):
    """Plane p[b, c, :] -> p[b-db, c-dc, :], zero-padded at the edges."""
    if db:
        p = jnp.pad(p[:-db, :, :], [(db, 0), (0, 0), (0, 0)])
    if dc:
        p = jnp.pad(p[:, :-dc, :], [(0, 0), (dc, 0), (0, 0)])
    return p


def _octant_cube_from_offset(f_off, R: int, sx: int, sy: int, sz: int):
    """Slice one octant cube (R+1)^3 from the offset-frame cube (M,...).

    f_off axis d is indexed by offset o in 0..M-1 meaning delta = o for
    o <= M/2 and delta = o - M for o > M/2 (i.e. jnp.roll(-src) order).
    """
    def ax(sl, sign):
        if sign > 0:
            return sl[:R + 1]
        # negative direction: deltas -1..-R at indices M-1..M-R; index
        # -(a) = M - a; build a = 0..R with a=0 mapping to delta 0
        return jnp.concatenate([sl[:1], sl[:-(R + 1):-1]], axis=0)

    out = ax(f_off, sx)
    out = jnp.moveaxis(ax(jnp.moveaxis(out, 1, 0), sy), 0, 1)
    out = jnp.moveaxis(ax(jnp.moveaxis(out, 2, 0), sz), 0, 2)
    return out


def _stitch_octants_to_offset(cubes, R: int, M: int):
    """Inverse of `_octant_cube_from_offset` for the 8 rate cubes.

    cubes: (8, R+1, R+1, R+1, C) in `_octant_signs` order ->
    offset-frame (M, M, M, C) with each offset taken from exactly one
    octant (positive-sign octants own the zero faces).
    """
    def stitch_axis(pos, neg, axis):
        # offsets 0..R from pos[0..R]; offsets -1..-(M-R-1)... for even M
        # the negative side has M - (R+1) entries: a = 1..M-R-1 reversed
        neg_part = jnp.flip(
            jax.lax.slice_in_dim(neg, 1, M - R, axis=axis), axis=axis)
        return jnp.concatenate([pos, neg_part], axis=axis)

    # reduce over z sign, then y, then x; cubes order:
    # (+,+,+),(+,+,-),(+,-,+),(+,-,-),(-,+,+),(-,+,-),(-,-,+),(-,-,-)
    z = [stitch_axis(cubes[i], cubes[i + 1], axis=2)
         for i in (0, 2, 4, 6)]
    y = [stitch_axis(z[0], z[1], axis=1), stitch_axis(z[2], z[3], axis=1)]
    return stitch_axis(y[0], y[1], axis=0)


def sweep_octant_source_batch(cfg: SweepConfig, fields: SourceFields,
                              srcpos_batch, nflux_batch) -> RateGrids:
    """Dense-octant trace of a source batch; same contract as
    `sweep_sources_accumulate`.

    Requires an even cubic mesh (trace extents M/2 forward, M/2-1
    backward, evolve_source.F90:103-109).
    """
    M = cfg.mesh
    R = M // 2
    n = M**3
    dtype = fields.ndens.dtype
    dr = jnp.asarray(cfg.dr, dtype=dtype)
    vol_over_scale = jnp.asarray(cfg.vol / cfg.flux_scale, dtype=dtype)
    abu = jnp.asarray(_ABU, dtype=dtype)
    sig = jnp.asarray(_SIGMAS, dtype=dtype)

    eps = cfg.epsilon
    fstack = jnp.stack(
        [fields.ndens, jnp.maximum(fields.h_av0, eps),
         jnp.maximum(fields.h_av1, eps), jnp.maximum(fields.he_av0, eps),
         jnp.maximum(fields.he_av1, eps)], axis=-1).reshape(M, M, M, 5)

    biota, ciota = _plane_geometry(R, dtype)                # (R+1, R+1)
    n_planes = 3 * R + 1

    def one_octant(f_oct, valid_a_max, owns_zero, nflux):
        """Sweep one octant of one source.

        f_oct: (R+1, R+1, R+1, 5) octant-frame fields;
        valid_a_max: (3,) per-axis maximum valid |delta| (R for the
        positive direction, R-1 for negative);
        owns_zero: (3,) bool -- this octant owns the delta=0 face of the
        axis (positive-sign octants do), used so cells shared between
        octants contribute photon loss exactly once;
        returns (rate cube (R+1,R+1,R+1,4), photon loss scalar).
        """
        # --- source-cell outgoing columns seed plane 0
        f0 = f_oct[0, 0, 0]
        ncols0 = jnp.stack([f0[1], f0[3], f0[4]]) * f0[0]
        cc0 = ncols0 * (0.5 * dr) * abu                    # (3,)
        p0 = jnp.zeros((R + 1, R + 1, 3), dtype=dtype).at[0, 0].set(cc0)
        pz = jnp.zeros_like(p0)

        def plane_step(carry, s):
            p1, p2, p3 = carry  # planes s-1, s-2, s-3
            a = s - biota - ciota                           # (R+1, R+1)
            valid = ((a >= 0) & (a <= valid_a_max[0])
                     & (biota <= valid_a_max[1])
                     & (ciota <= valid_a_max[2]))
            # the source cell is handled separately
            valid = valid & (s > 0)
            ac = jnp.clip(a, 0, R)

            af = ac.astype(dtype)
            bf = biota.astype(dtype)
            cf = ciota.astype(dtype)

            # --- dominant axis (z wins ties, then y, then x;
            #     column_density.f90:107,199,275)
            is_z = (cf >= bf) & (cf >= af)
            is_y = (~is_z) & (bf >= af) & (bf >= cf)
            dom = jnp.where(is_z, 2, jnp.where(is_y, 1, 0))
            d_dom = jnp.where(is_z, cf, jnp.where(is_y, bf, af))
            d_u = jnp.where(dom == 0, bf, af)
            d_v = jnp.where(dom == 2, bf, cf)
            d_dom = jnp.maximum(d_dom, 1.0)

            alam = (d_dom - 0.5) / d_dom
            du = 2.0 * jnp.abs(alam * d_u - (d_u - 0.5))
            dv = 2.0 * jnp.abs(alam * d_v - (d_v - 0.5))
            s1 = (1.0 - du) * (1.0 - dv)
            s2 = du * (1.0 - dv)
            s3 = (1.0 - du) * dv
            s4 = du * dv

            # --- corner fetch as shifted slices (see module docstring):
            # c1 always from plane s-3 shifted (1,1); c4 from s-1;
            # c2/c3 from s-2 with dominant-axis-dependent shifts
            c1 = _shift_bc(p3, 1, 1)
            p1s_01 = _shift_bc(p1, 0, 1)
            p1s_10 = _shift_bc(p1, 1, 0)
            p2s_11 = _shift_bc(p2, 1, 1)
            p2s_01 = _shift_bc(p2, 0, 1)
            p2s_10 = _shift_bc(p2, 1, 0)

            dom3 = dom[..., None]
            c4 = jnp.where(dom3 == 2, p1s_01,
                           jnp.where(dom3 == 1, p1s_10, p1))
            c2 = jnp.where(dom3 == 2, p2s_11,
                           jnp.where(dom3 == 1, p2s_11, p2s_01))
            c3 = jnp.where(dom3 == 2, p2s_01,
                           jnp.where(dom3 == 1, p2s_10, p2s_10))

            def w(sg, c):
                return sg[..., None] / jnp.maximum(MIN_WEIGHT_DENOM,
                                                   c * sig)

            w1, w2, w3, w4 = w(s1, c1), w(s2, c2), w(s3, c3), w(s4, c4)
            wsum = w1 + w2 + w3 + w4
            cd_in = (c1 * w1 + c2 * w2 + c3 * w3 + c4 * w4) / wsum

            # diagonal boost (column_density.f90:174-184)
            d_u_a = d_u
            d_v_a = d_v
            on_diag = (d_dom == 1.0) & ((d_u_a == 1.0) | (d_v_a == 1.0))
            full_diag = (d_u_a == 1.0) & (d_v_a == 1.0)
            boost = jnp.where(on_diag,
                              jnp.where(full_diag, SQRT3, SQRT2),
                              1.0).astype(dtype)
            cd_in = cd_in * boost[..., None]

            path_units = jnp.sqrt((d_u * d_u + d_v * d_v)
                                  / (d_dom * d_dom) + 1.0)
            path = path_units * dr

            # LLS fog (evolve_point.F90:177-180)
            if cfg.coldensh_LLS > 0.0:
                cd_in = cd_in.at[..., 0].add(
                    cfg.coldensh_LLS * path_units)

            # --- cell fields: extract the anti-diagonal plane a = s-b-c
            f = f_oct[ac, biota, ciota]                    # (R+1,R+1,5)
            ncols = jnp.stack([f[..., 1], f[..., 3], f[..., 4]],
                              axis=-1) * f[..., 0:1]

            cd_out = cd_in + ncols * path[..., None] * abu
            # invalid positions must carry zeros so later planes' corner
            # reads see untouched cells as zero columns
            plane_out = jnp.where(valid[..., None], cd_out, 0.0)

            dist2 = af * af + bf * bf + cf * cf
            vol_ratio = 4.0 * const.pi * dist2 * path_units

            phi = _cell_rates(cfg, cd_in, cd_out,
                              vol_ratio * vol_over_scale, nflux,
                              f[..., 2])

            live = valid & (cd_in[..., 0] < cfg.max_coldensh)
            fl = live.astype(dtype)
            denom = ncols * abu
            rates = jnp.stack(
                [fl * phi.photo_cell_HI / denom[..., 0],
                 fl * phi.photo_cell_HeI / denom[..., 1],
                 fl * phi.photo_cell_HeII / denom[..., 2],
                 fl * phi.heat], axis=-1)

            on_bound = ((a == valid_a_max[0]) | (biota == valid_a_max[1])
                        | (ciota == valid_a_max[2]))
            owned = ((a > 0) | owns_zero[0]) & ((biota > 0) | owns_zero[1]) \
                & ((ciota > 0) | owns_zero[2])
            ploss = jnp.sum(jnp.where(live & on_bound & owned,
                                      phi.photo_out / vol_ratio, 0.0))

            return (plane_out, p1, p2), (rates, ploss)

        (pl, _, _), (rate_planes, plosses) = jax.lax.scan(
            plane_step, (p0, pz, pz), jnp.arange(1, n_planes))

        # source-cell rates (evolve_point.F90:140-151)
        zero3 = jnp.zeros(3, dtype=dtype)
        phi0 = _cell_rates(cfg, zero3, cc0, vol_over_scale, nflux, f0[2])
        denom0 = ncols0 * abu
        src_rates = jnp.stack([phi0.photo_cell_HI / denom0[0],
                               phi0.photo_cell_HeI / denom0[1],
                               phi0.photo_cell_HeII / denom0[2],
                               phi0.heat])

        # unskew: cube[a, b, c] = rate_planes[a+b+c-1, b, c]
        aa = np.arange(R + 1, dtype=np.int32)[:, None, None]
        idx = np.clip(aa + biota[None] + ciota[None] - 1, 0,
                      n_planes - 2)                        # (R+1,R+1,R+1)
        cube = rate_planes[idx, biota[None], ciota[None]]
        return cube, src_rates, jnp.sum(plosses)

    # static per-octant metadata (extent / zero-face ownership)
    vmax_all = np.asarray(
        [[R if s > 0 else R - 1 for s in sgn] for sgn in _octant_signs()],
        dtype=np.int32)                                     # (8, 3)
    owns_all = np.asarray(
        [[s > 0 for s in sgn] for sgn in _octant_signs()])  # (8, 3)

    def one_source(srcpos, nflux):
        # periodic shift to the offset frame (index i = delta mod M)
        f_off = jnp.roll(fstack, shift=(-srcpos[0], -srcpos[1],
                                        -srcpos[2]), axis=(0, 1, 2))

        # slice the 8 octant cubes (static slicing), then run ONE
        # vmapped sweep instance over the stacked octant axis -- the
        # sweep body is octant-independent, which keeps the XLA graph
        # 8x smaller than unrolling the octants
        f_octs = jnp.stack(
            [_octant_cube_from_offset(f_off, R, sx, sy, sz)
             for (sx, sy, sz) in _octant_signs()])          # (8, R+1,...)
        cubes, src_rates_all, pls = jax.vmap(
            one_octant, in_axes=(0, 0, 0, None))(
                f_octs, vmax_all, owns_all, nflux)
        src_rates_acc = src_rates_all[0]
        ploss_acc = jnp.sum(pls) + nflux[0] * 0.0
        rate_off = _stitch_octants_to_offset(
            [cubes[i] for i in range(8)], R, M)             # (M,M,M,4)
        # the [0,0,0] entry of the stitched cube carries a clipped-index
        # artifact from the unskew; overwrite it with the true
        # source-cell rates (deposited exactly once)
        rate_off = rate_off.at[0, 0, 0].set(src_rates_acc)
        # back to the grid frame
        rate_grid = jnp.roll(rate_off, shift=(srcpos[0], srcpos[1],
                                              srcpos[2]), axis=(0, 1, 2))
        return rate_grid, ploss_acc

    rate_grids, plosses = jax.vmap(one_source)(srcpos_batch, nflux_batch)
    live = jnp.any(nflux_batch > 0.0, axis=1)
    rg = jnp.sum(jnp.where(live[:, None, None, None, None],
                           rate_grids, 0.0), axis=0).reshape(n, 4)
    pl = jnp.sum(jnp.where(live, plosses, 0.0))
    return RateGrids(lls_loss=jnp.zeros_like(pl),
                     phih=rg[:, 0], phihe0=rg[:, 1], phihe1=rg[:, 2],
                     phiheat=rg[:, 3], photon_loss=pl)
