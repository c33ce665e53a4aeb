"""Vectorised short-characteristics column-density interpolation.

Re-implementation of ``code/files_for_3D/column_density.f90:28-376``
(`cinterp` + `weightf`) for a whole wavefront shell at once.

The reference handles the three ray orientations (z/y/x-plane crossing)
as separate scalar branches.  Here the dominant axis is selected per
cell and the other two axes are permuted into a canonical (u, v) pair,
making the bilinear corner interpolation one branch-free vector
computation; the three species reuse the same corner gather with
per-species opacity-biased weights (weightf, column_density.f90:351-376).
"""

from typing import Tuple

import jax.numpy as jnp

from .. import constants as const

SQRT2 = 1.4142135623730951
SQRT3 = 1.7320508075688772
# weightf clamp (column_density.f90:358,372)
MIN_WEIGHT_DENOM = 0.6


def _fsign(x):
    """Fortran sign(1, x): +1 for x >= 0 else -1."""
    return jnp.where(x >= 0, 1, -1).astype(jnp.int32)


def cinterp_shell(
    offsets,            # (N, 3) int32: (di, dj, dk) from source
    srcpos,             # (3,) int32: source cell (0-based)
    mesh: int,
    cdh_flat,           # (mesh^3,) outgoing HI column densities
    cdhe0_flat,         # (mesh^3,)
    cdhe1_flat,         # (mesh^3,)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Incoming column densities + path length for a shell of cells.

    Returns (cdensi_HI, cdensi_HeI, cdensi_HeII, path_in_cell_units).
    """
    dtype = cdh_flat.dtype
    d = offsets  # (N, 3)
    da = jnp.abs(d)
    idela, jdela, kdela = da[:, 0], da[:, 1], da[:, 2]

    # branch order of the reference (column_density.f90:107,199,275):
    # z wins ties, then y, then x
    is_z = (kdela >= jdela) & (kdela >= idela)
    is_y = (~is_z) & (jdela >= idela) & (jdela >= kdela)
    dom = jnp.where(is_z, 2, jnp.where(is_y, 1, 0))      # (N,)

    # canonical (u, v) = remaining axes in ascending order
    u_ax = jnp.where(dom == 0, 1, 0)
    v_ax = jnp.where(dom == 2, 1, 2)

    nidx = jnp.arange(d.shape[0])
    d_dom = d[nidx, dom].astype(dtype)
    d_u = d[nidx, u_ax].astype(dtype)
    d_v = d[nidx, v_ax].astype(dtype)
    sgn_dom = _fsign(d[nidx, dom])
    sgn_u = _fsign(d[nidx, u_ax])
    sgn_v = _fsign(d[nidx, v_ax])

    # crossing point on the dominant-axis cell face
    # alam = (d_dom - sgn*0.5)/d_dom   (column_density.f90:111)
    alam = (d_dom - 0.5 * sgn_dom.astype(dtype)) / d_dom
    # fractional distances to the u/v "minus" corners
    # du = 2|uc - (u_m + 0.5 sgn_u)| in offset coordinates
    du = 2.0 * jnp.abs(alam * d_u - (d_u - 0.5 * sgn_u.astype(dtype)))
    dv = 2.0 * jnp.abs(alam * d_v - (d_v - 0.5 * sgn_v.astype(dtype)))

    # geometric bilinear weights for the 4 corners:
    # corner (u_m, v_m): (1-du)(1-dv); (u, v_m): du(1-dv);
    # (u_m, v): (1-du)dv; (u, v): du dv   (column_density.f90:119-122)
    s1 = (1.0 - du) * (1.0 - dv)
    s2 = du * (1.0 - dv)
    s3 = (1.0 - du) * dv
    s4 = du * dv

    # absolute corner positions (periodic)
    pos = (srcpos[None, :] + d) % mesh                    # (N, 3) cell itself

    def corner_flat(u_minus: bool, v_minus: bool):
        # dominant axis always steps toward the source
        c = pos.astype(jnp.int32)
        cd_ = c[nidx, dom] - sgn_dom
        cu = c[nidx, u_ax] - (sgn_u if u_minus else 0)
        cv = c[nidx, v_ax] - (sgn_v if v_minus else 0)
        cd_ = jnp.mod(cd_, mesh)
        cu = jnp.mod(cu, mesh)
        cv = jnp.mod(cv, mesh)
        # scatter back into (x, y, z) order then flatten
        cx = jnp.where(dom == 0, cd_, jnp.where(u_ax == 0, cu, cv))
        cy = jnp.where(dom == 1, cd_, jnp.where(u_ax == 1, cu, cv))
        cz = jnp.where(dom == 2, cd_, jnp.where(v_ax == 2, cv, cu))
        return (cx * mesh + cy) * mesh + cz

    f1 = corner_flat(True, True)     # (u_m, v_m)
    f2 = corner_flat(False, True)    # (u, v_m)
    f3 = corner_flat(True, False)    # (u_m, v)
    f4 = corner_flat(False, False)   # (u, v)

    geo = (s1, s2, s3, s4)
    flats = (f1, f2, f3, f4)

    # diagonal boost (column_density.f90:174-184): applies when the
    # dominant offset is exactly 1 and at least one other offset is 1
    d_dom_a = da[nidx, dom]
    d_u_a = da[nidx, u_ax]
    d_v_a = da[nidx, v_ax]
    on_diag = (d_dom_a == 1) & ((d_u_a == 1) | (d_v_a == 1))
    full_diag = (d_u_a == 1) & (d_v_a == 1)
    diag_boost = jnp.where(
        on_diag, jnp.where(full_diag, SQRT3, SQRT2), 1.0).astype(dtype)

    def interp(cd_flat, sigma):
        cs = [cd_flat[f] for f in flats]
        ws = [s / jnp.maximum(MIN_WEIGHT_DENOM, c * sigma)
              for s, c in zip(geo, cs)]
        wsum = ws[0] + ws[1] + ws[2] + ws[3]
        cd = (cs[0] * ws[0] + cs[1] * ws[1] + cs[2] * ws[2]
              + cs[3] * ws[3]) / wsum
        return cd * diag_boost

    cdensi = interp(cdh_flat, const.sigma_HI_at_ion_freq)
    cdensihe0 = interp(cdhe0_flat, const.sigma_HeI_at_ion_freq)
    cdensihe1 = interp(cdhe1_flat, const.sigma_HeII_at_ion_freq)

    # path length through the cell (column_density.f90:194,269,341)
    path = jnp.sqrt((d_u * d_u + d_v * d_v) / (d_dom * d_dom) + 1.0)

    return cdensi, cdensihe0, cdensihe1, path
