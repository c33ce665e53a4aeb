"""Vectorised short-characteristics column-density interpolation.

Re-implementation of ``code/files_for_3D/column_density.f90:28-376``
(`cinterp` + `weightf`) for a whole wavefront shell at once.

The reference handles the three ray orientations (z/y/x-plane crossing)
as separate scalar branches.  Here the dominant axis is selected per
cell and the other two axes are permuted into a canonical (u, v) pair,
making the bilinear corner interpolation one branch-free vector
computation.  The three species' column-density grids are stored
interleaved as one (ncells, 3) array so each corner fetch is a single
gather of 3-vectors (TPU gathers cost per index, not per byte), with
per-species opacity-biased weights (weightf,
column_density.f90:351-376) applied vectorised over the trailing axis.
"""

from typing import Tuple

import jax.numpy as jnp

from .. import constants as const

SQRT2 = 1.4142135623730951
SQRT3 = 1.7320508075688772
# weightf clamp (column_density.f90:358,372)
MIN_WEIGHT_DENOM = 0.6

# species threshold cross sections, order (HI, HeI, HeII)
_SIGMAS = (const.sigma_HI_at_ion_freq, const.sigma_HeI_at_ion_freq,
           const.sigma_HeII_at_ion_freq)


def _fsign(x):
    """Fortran sign(1, x): +1 for x >= 0 else -1."""
    return jnp.where(x >= 0, 1, -1).astype(jnp.int32)


def cinterp_shell(
    offsets,            # (N, 3) int32: (di, dj, dk) from source
    srcpos,             # (3,) int32: source cell (0-based)
    mesh: int,
    cd_all,             # (mesh^3, 3): outgoing columns (HI, HeI, HeII)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Incoming column densities + path length for a shell of cells.

    Returns (cdensi (N, 3), path (N,) in cell units).
    """
    dtype = cd_all.dtype
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
    du = 2.0 * jnp.abs(alam * d_u - (d_u - 0.5 * sgn_u.astype(dtype)))
    dv = 2.0 * jnp.abs(alam * d_v - (d_v - 0.5 * sgn_v.astype(dtype)))

    # bilinear weights for corners (u_m,v_m),(u,v_m),(u_m,v),(u,v)
    # (column_density.f90:119-122)
    s1 = (1.0 - du) * (1.0 - dv)
    s2 = du * (1.0 - dv)
    s3 = (1.0 - du) * dv
    s4 = du * dv

    pos = (srcpos[None, :] + d) % mesh                    # (N, 3)

    def corner_flat(u_minus: bool, v_minus: bool):
        c = pos.astype(jnp.int32)
        cd_ = c[nidx, dom] - sgn_dom
        cu = c[nidx, u_ax] - (sgn_u if u_minus else 0)
        cv = c[nidx, v_ax] - (sgn_v if v_minus else 0)
        cd_ = jnp.mod(cd_, mesh)
        cu = jnp.mod(cu, mesh)
        cv = jnp.mod(cv, mesh)
        cx = jnp.where(dom == 0, cd_, jnp.where(u_ax == 0, cu, cv))
        cy = jnp.where(dom == 1, cd_, jnp.where(u_ax == 1, cu, cv))
        cz = jnp.where(dom == 2, cd_, jnp.where(v_ax == 2, cv, cu))
        return (cx * mesh + cy) * mesh + cz

    # one (N, 3) gather per corner
    c1 = cd_all[corner_flat(True, True)]
    c2 = cd_all[corner_flat(False, True)]
    c3 = cd_all[corner_flat(True, False)]
    c4 = cd_all[corner_flat(False, False)]

    sig = jnp.asarray(_SIGMAS, dtype=dtype)               # (3,)

    def w(s_geo, c):
        return s_geo[:, None] / jnp.maximum(MIN_WEIGHT_DENOM, c * sig)

    w1, w2, w3, w4 = w(s1, c1), w(s2, c2), w(s3, c3), w(s4, c4)
    wsum = w1 + w2 + w3 + w4
    cdensi = (c1 * w1 + c2 * w2 + c3 * w3 + c4 * w4) / wsum  # (N, 3)

    # diagonal boost (column_density.f90:174-184)
    d_dom_a = da[nidx, dom]
    d_u_a = da[nidx, u_ax]
    d_v_a = da[nidx, v_ax]
    on_diag = (d_dom_a == 1) & ((d_u_a == 1) | (d_v_a == 1))
    full_diag = (d_u_a == 1) & (d_v_a == 1)
    diag_boost = jnp.where(
        on_diag, jnp.where(full_diag, SQRT3, SQRT2), 1.0).astype(dtype)
    cdensi = cdensi * diag_boost[:, None]

    # path length through the cell (column_density.f90:194,269,341)
    path = jnp.sqrt((d_u * d_u + d_v * d_v) / (d_dom * d_dom) + 1.0)

    return cdensi, path
