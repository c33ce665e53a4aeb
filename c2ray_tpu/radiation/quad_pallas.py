"""Pallas TPU kernel for the quadrature photo-ionization rates.

Same math as ``quadrature.photoion_rates_quad`` (the gather-free
exponential-sum evaluation of radiation_photoionrates.f90), hand-fused
into one VMEM-resident kernel.

Why a kernel: per cell the evaluation expands 6 column densities into
(nbands, K) per-term arrays (attenuation exponentials, thick/thin
switches, tau-weighted species splits, secondary-ionization f-factor
sums).  Under XLA those (cells, nbands*K) intermediates feed several
reductions, get materialized to HBM (hundreds of MB per sweep plane)
and the op becomes bandwidth-bound.  Here each block holds one
(P, C) tile of terms x cells in VMEM, computes every output in one
pass, and writes only the 6 per-cell results -- arithmetic intensity
~P*10 flops per ~50 bytes moved, firmly compute-bound on the VPU.

Layout: P (= live bands * K, padded to a multiple of 8) on sublanes,
a block of C cells on lanes; per-term constants ride along as a
(P, NCONST) matrix whose columns are sliced inside the kernel.

The flat per-term thick/thin switch |dtau_term| (vs the reference
tables' per-band |dtau_band|, radiation_photoionrates.f90:331-464) is a
strictly sharper guard: the thin branch is the first-order expansion of
E_in - E_out in the *term's* own optical depth.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as const
from .photo import (PhotRates, TAU_HEAT_LIMIT, TAU_PHOTO_LIMIT, _AR2, _BR1,
                    _BR2, _CR1, _CR2, _DR1)
from .quadrature import QuadTables, SourceQuad

# constant-matrix column layout
_C_SHI, _C_SHEI, _C_SHEII, _C_A = 0, 1, 2, 3
_C_MBB, _C_MPL, _C_MQSO = 4, 5, 6
_C_AH = 7             # 7, 8, 9: Ah_HI, Ah_HeI, Ah_HeII
_C_F = 10             # 10..21: f1ion/f2ion/f1heat/f2heat x HI/HeI/HeII
_NCONST = 22

_CELL_BLOCK = 512     # cells per block (lanes)


def _flat_terms(sq: SourceQuad, qt: QuadTables, isothermal):
    """(P_live, NCONST) numpy constant rows for one source type."""
    sig_hat = np.asarray(sq.sigma_hat, np.float64)      # (nlive, K)
    nlive, K = sig_hat.shape
    P = nlive * K
    rows = np.zeros((P, _NCONST))
    band_idx = np.repeat(np.arange(sq.band_lo, sq.band_hi + 1), K)
    sh = sig_hat.reshape(-1)
    rows[:, _C_SHI] = np.asarray(qt.sigma_HI)[band_idx] * sh
    rows[:, _C_SHEI] = np.asarray(qt.sigma_HeI)[band_idx] * sh
    rows[:, _C_SHEII] = np.asarray(qt.sigma_HeII)[band_idx] * sh
    rows[:, _C_A] = np.asarray(sq.A_photo, np.float64).reshape(-1)
    if not isothermal and sq.A_heat_HI is not None:
        rows[:, _C_AH + 0] = np.asarray(sq.A_heat_HI,
                                        np.float64).reshape(-1)
        rows[:, _C_AH + 1] = np.asarray(sq.A_heat_HeI,
                                        np.float64).reshape(-1)
        rows[:, _C_AH + 2] = np.asarray(sq.A_heat_HeII,
                                        np.float64).reshape(-1)
        fnames = ("f1ion_HI", "f1ion_HeI", "f1ion_HeII",
                  "f2ion_HI", "f2ion_HeI", "f2ion_HeII",
                  "f1heat_HI", "f1heat_HeI", "f1heat_HeII",
                  "f2heat_HI", "f2heat_HeI", "f2heat_HeII")
        for j, name in enumerate(fnames):
            rows[:, _C_F + j] = np.asarray(getattr(qt, name))[band_idx]
    return rows


def build_rate_constants(qt: QuadTables, *, isothermal: bool,
                         dtype=jnp.float32):
    """Stack all active source types into one (P_pad, NCONST) matrix.

    Each type's rows carry a one-hot type mask so its per-cell flux
    multiplier can be selected inside the kernel.
    """
    blocks = []
    for sq, col in ((qt.bb, _C_MBB), (qt.pl, _C_MPL), (qt.qso, _C_MQSO)):
        if sq is None:
            continue
        rows = _flat_terms(sq, qt, isothermal)
        rows[:, col] = 1.0
        blocks.append(rows)
    mat = np.concatenate(blocks, axis=0)
    P = mat.shape[0]
    P_pad = -(-P // 8) * 8
    if P_pad != P:
        mat = np.pad(mat, [(0, P_pad - P), (0, 0)])
    return jnp.asarray(mat, dtype=dtype)


def _rate_kernel(consts_ref, cdi0, cdi1, cdi2, cdo0, cdo1, cdo2,
                 nfb, nfp, nfq, vol, istate,
                 o_hi, o_hei, o_heii, o_heat, o_in, o_out,
                 *, isothermal: bool):
    c = consts_ref[:]                                   # (P, NCONST)
    col = lambda j: c[:, j][:, None]                    # (P, 1)
    sHI, sHeI, sHeII, A = (col(_C_SHI), col(_C_SHEI), col(_C_SHEII),
                           col(_C_A))

    ci0, ci1, ci2 = cdi0[:], cdi1[:], cdi2[:]           # (1, C)
    tin = sHI * ci0 + sHeI * ci1 + sHeII * ci2          # (P, C)
    tHI = sHI * (cdo0[:] - ci0)
    tHeI = sHeI * (cdo1[:] - ci1)
    tHeII = sHeII * (cdo2[:] - ci2)
    dtau = tHI + tHeI + tHeII
    tout = tin + dtau

    E_in = jnp.exp(-jnp.minimum(tin, 80.0))
    E_out = jnp.exp(-jnp.minimum(tout, 80.0))
    diff = E_in - E_out

    # per-cell flux by source type (one-hot masks select the term rows)
    nfl = (col(_C_MBB) * nfb[:] + col(_C_MPL) * nfp[:]
           + col(_C_MQSO) * nfq[:])                     # (P, C)

    contrib = jnp.where(jnp.abs(dtau) > TAU_PHOTO_LIMIT,
                        diff, E_in * dtau)
    AE = A * E_in
    phi_in = jnp.sum(nfl * AE, axis=0, keepdims=True)   # (1, C)
    Acon = nfl * (A * contrib)
    phi_all = jnp.sum(Acon, axis=0, keepdims=True)

    tiny = jnp.float32(1.1754944e-38)
    inv = 1.0 / jnp.maximum(dtau, tiny)
    rvol = 1.0 / vol[:]                                 # (1, C)
    pc = Acon * inv
    ph_hi = jnp.sum(pc * tHI, axis=0, keepdims=True) * rvol
    ph_hei = jnp.sum(pc * tHeI, axis=0, keepdims=True) * rvol
    ph_heii = jnp.sum(pc * tHeII, axis=0, keepdims=True) * rvol

    o_in[:] = phi_in
    o_out[:] = phi_in - phi_all

    if isothermal:
        o_hi[:] = ph_hi
        o_hei[:] = ph_hei
        o_heii[:] = ph_heii
        o_heat[:] = jnp.zeros_like(ph_hi)
        return

    hcontrib = jnp.where(jnp.abs(dtau) > TAU_HEAT_LIMIT,
                         diff, E_in * dtau)
    hc = nfl * hcontrib * inv
    pHI = col(_C_AH + 0) * hc * tHI
    pHeI = col(_C_AH + 1) * hc * tHeI
    pHeII = col(_C_AH + 2) * hc * tHeII

    def fsum(j):
        return jnp.sum(col(_C_F + 3 * j) * pHI
                       + col(_C_F + 3 * j + 1) * pHeI
                       + col(_C_F + 3 * j + 2) * pHeII,
                       axis=0, keepdims=True) * rvol

    df_heat = jnp.sum(pHI + pHeI + pHeII, axis=0, keepdims=True) * rvol
    fra1, fra2, fra3, fra4 = fsum(0), fsum(1), fsum(2), fsum(3)

    x = istate[:]
    y1R = lambda i: _CR1[i] * (1.0 - x ** _BR1[i]) ** _DR1[i]
    y2R = lambda i: _CR2[i] * x ** _AR2[i] * (1.0 - x ** _BR2[i]) ** 2

    o_heat[:] = df_heat - y1R(2) * fra3 + y2R(2) * fra4
    o_hi[:] = ph_hi + (y1R(0) * fra1 - y2R(0) * fra2) / (
        const.ion_freq_HI * const.hplanck)
    o_hei[:] = ph_hei + (y1R(1) * fra1 - y2R(1) * fra2) / (
        const.ion_freq_HeI * const.hplanck)
    o_heii[:] = ph_heii


def photoion_rates_quad_pallas(
    consts,
    colum_in_HI, colum_out_HI,
    colum_in_HeI, colum_out_HeI,
    colum_in_HeII, colum_out_HeII,
    vol,
    i_state,
    nflux_bb=None,
    nflux_pl=None,
    nflux_qso=None,
    do_heating: bool = True,
    interpret: bool = False,
) -> PhotRates:
    """Kernel-backed drop-in for `photoion_rates_quad`.

    `consts` is the (P, NCONST) matrix from `build_rate_constants`
    (its isothermal flag must match ``not do_heating``).
    """
    cd = jnp.asarray(colum_in_HI)
    shape = cd.shape
    dtype = cd.dtype
    n = int(np.prod(shape)) if shape else 1
    C = _CELL_BLOCK
    n_pad = -(-max(n, 1) // C) * C

    def prep(a, fill=0.0):
        if a is None:
            a = fill
        a = jnp.broadcast_to(jnp.asarray(a, dtype=dtype), shape)
        return jnp.pad(a.reshape(-1), (0, n_pad - n)).reshape(1, n_pad)

    vol = jnp.broadcast_to(jnp.asarray(vol, dtype=dtype), shape).reshape(-1)
    vol_p = jnp.pad(vol, (0, n_pad - n), constant_values=1.0
                    ).reshape(1, n_pad)
    ins = [prep(a) for a in
           (colum_in_HI, colum_in_HeI, colum_in_HeII,
            colum_out_HI, colum_out_HeI, colum_out_HeII,
            nflux_bb, nflux_pl, nflux_qso)]
    istate_p = prep(i_state)

    P = consts.shape[0]
    grid = (n_pad // C,)
    cell_spec = pl.BlockSpec((1, C), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((P, _NCONST), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((1, n_pad), dtype)] * 6

    outs = pl.pallas_call(
        functools.partial(_rate_kernel, isothermal=not do_heating),
        grid=grid,
        in_specs=[const_spec] + [cell_spec] * 11,
        out_specs=[cell_spec] * 6,
        out_shape=out_shape,
        interpret=interpret,
    )(consts, ins[0], ins[1], ins[2], ins[3], ins[4], ins[5],
      ins[6], ins[7], ins[8], vol_p, istate_p)

    unpad = lambda a: a.reshape(-1)[:n].reshape(shape)
    o_hi, o_hei, o_heii, o_heat, o_in, o_out = (unpad(o) for o in outs)
    return PhotRates(photo_cell_HI=o_hi, photo_cell_HeI=o_hei,
                     photo_cell_HeII=o_heii, heat=o_heat,
                     photo_in=o_in, photo_out=o_out)
