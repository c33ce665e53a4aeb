"""Global chemistry pass: apply accumulated rates on every cell at once.

Re-implementation of ``global_pass`` -> ``evolve0D_global`` ->
``do_chemistry`` (evolve.F90:435-501, evolve_point.F90:325-646).

The reference's triple loop over cells collapses into one vectorised
call: all mesh^3 cells iterate the {electron density -> T-dependent
rates -> two doric passes averaged -> thermal} fixed point together
inside a masked `lax.while_loop` (per-cell convergence, cap 400
iterations, evolve_point.F90:487-640).
"""

import hashlib
from collections import OrderedDict
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..chemistry import (IonFractions, IonState, coldens, doric,
                         electrondens, prepare_doric_factors)
from ..cooling import CoolingTables
from ..rates import RateCoeffs, rate_coefficients
from ..state import GridState
from ..thermal import (MAX_SUBSTEPS, thermal, thermal_finalize,
                       thermal_init, thermal_substeps)
from .source_sweep import RateGrids

# c2ray_parameters.f90:36,44
MIN_FRACTIONAL_CHANGE = 1.0e-2
MIN_FRACTION_OF_ATOMS = 1.0e-8
MAX_CHEM_ITER = 400

# Damped Picard: past this many fixed-point iterations, successive
# iterates are averaged (x' = (x_new + x_prev)/2).  In f32 a cell
# minority's iterate map is locally unstable and enters a >1% limit
# cycle that runs to the 400 cap (f64 converges the same passes in ~2
# iterations -- round-5 measurement); damping contracts those cells to
# the f64 fixed point instead of stopping at an arbitrary phase of the
# oscillation.  Plain (reference, evolve_point.F90:487-640) iteration
# is untouched below the threshold, so every pass that converges
# normally is bit-identical to the undamped scheme.
DAMP_AFTER = 50
DAMP_FACTOR = 0.5


@dataclass(frozen=True)
class ChemistryConfig:
    cooling: Optional[CoolingTables]
    isothermal: bool = False
    epsilon: float = 1.0e-20
    cosmo_cool_factor: float = 0.0
    isothermal_temperature: float = 1.0e4
    max_iter: int = MAX_CHEM_ITER
    # host-loop two-phase thermal: cap the full-set lockstep sub-cycle
    # at this many sub-steps, then finish the unfinished minority on a
    # compacted bucket (bit-identical continuation; see _split_trip).
    # None = auto (16 on TPU, disabled elsewhere); <=0 disables.
    thermal_chunk: Optional[int] = None


def _doric_half(cfg: ChemistryConfig, dt, ndens, clumping,
                phi_HI, phi_HeI, phi_HeII, fixed_rates, ion, avg_t):
    """The doric half of one chemistry fixed-point iteration
    (evolve_point.F90:487-600): {electron density -> T-dependent rates
    -> two doric passes averaged}.  Returns (ion_new, de)."""

    def factors_from(ions: IonFractions):
        # cell columns enter doric only through opacity *ratios*, so the
        # path length cancels (the reference passes path=1.0 here,
        # evolve_point.F90:394-395,556-563); use unit path.
        cch = coldens(1.0, ions.h0, ndens, 1.0 - const.abu_he)
        cche0 = coldens(1.0, ions.he0, ndens, const.abu_he)
        cche1 = coldens(1.0, ions.he1, ndens, const.abu_he)
        return prepare_doric_factors(cch, cche0, cche1)

    de = electrondens(ndens, ion.avg)
    rates = (fixed_rates if cfg.isothermal
             else rate_coefficients(avg_t))

    fac = factors_from(ion.cur)
    ion1 = doric(dt, de, ion, phi_HI, phi_HeI, phi_HeII, fac, rates,
                 clumping, cfg.epsilon)
    de = electrondens(ndens, ion1.avg)

    fac2 = factors_from(ion1.cur)
    ion2 = doric(dt, de, ion1, phi_HI, phi_HeI, phi_HeII, fac2, rates,
                 clumping, cfg.epsilon)

    half = lambda a, b: 0.5 * (a + b)
    cur = IonFractions(*(half(a, b)
                         for a, b in zip(ion2.cur, ion1.cur)))
    # reference averages h_av(0), he_av(0), he_av(1) only
    # (evolve_point.F90:593-595)
    avg = IonFractions(
        h0=half(ion2.avg.h0, ion1.avg.h0),
        h1=ion2.avg.h1,
        he0=half(ion2.avg.he0, ion1.avg.he0),
        he1=half(ion2.avg.he1, ion1.avg.he1),
        he2=ion2.avg.he2,
    )
    ion_new = IonState(cur=cur, avg=avg, old=ion.old)
    de = electrondens(ndens, avg)
    return ion_new, de


def _conv_freeze(cfg: ChemistryConfig, carry, ion_new, temper1_new,
                 avg_t_new):
    """Convergence test + freeze of one chemistry iteration
    (evolve_point.F90:605-640): converged cells keep their values and
    leave the active set."""
    ion, temper1, avg_t, active = carry
    prev_avg = ion.avg
    temper2 = temper1
    avg = ion_new.avg

    def conv(new, old):
        return (jnp.abs((new - old) / new) < MIN_FRACTIONAL_CHANGE) | (
            new < MIN_FRACTION_OF_ATOMS)

    done = (conv(avg.h0, prev_avg.h0)
            & conv(avg.he0, prev_avg.he0)
            & conv(avg.he2, prev_avg.he2)
            & (jnp.abs((temper1_new - temper2) / temper1_new)
               < MIN_FRACTIONAL_CHANGE))

    # frozen (converged) cells keep their values
    keep = lambda new, old: jnp.where(active, new, old)
    ion_out = jax.tree.map(keep, ion_new, ion)
    temper1 = keep(temper1_new, temper1)
    avg_t = keep(avg_t_new, avg_t)
    active = active & ~done
    return (ion_out, temper1, avg_t, active)


def _chem_iteration(cfg: ChemistryConfig, dt, ndens, clumping,
                    phi_HI, phi_HeI, phi_HeII, phi_heat,
                    temper0, fixed_rates, cosmo_cool_factor, carry,
                    damp=None):
    """One masked chemistry fixed-point iteration
    (evolve_point.F90:487-640): {electron density -> T-dependent rates
    -> two doric passes averaged -> thermal} with converged cells
    frozen.  carry = (ion, temper1, avg_t, active).

    `damp` (traced scalar or None): blend factor toward the previous
    iterate (see DAMP_AFTER); 0 = the reference's plain iteration."""
    ion, temper1, avg_t, active = carry
    ion_new, de = _doric_half(cfg, dt, ndens, clumping, phi_HI,
                              phi_HeI, phi_HeII, fixed_rates, ion,
                              avg_t)
    if damp is not None:
        blend = lambda new, old: new + damp * (old - new)
        ion_new = jax.tree.map(blend, ion_new, ion)
        de = electrondens(ndens, ion_new.avg)

    temper1_new = temper0
    avg_t_new = avg_t
    if not cfg.isothermal:
        tr = thermal(dt, temper0, de, ndens, ion_new, phi_heat,
                     cfg.cooling, cosmo_cool_factor)
        temper1_new = tr.end_temper
        avg_t_new = tr.avg_temper
        if damp is not None:
            temper1_new = blend(temper1_new, temper1)
            avg_t_new = blend(avg_t_new, avg_t)

    return _conv_freeze(cfg, carry, ion_new, temper1_new, avg_t_new)


def _chem_setup(cfg: ChemistryConfig, state: GridState):
    ndens = state.ndens
    if cfg.isothermal:
        temper1_0 = jnp.full_like(ndens, cfg.isothermal_temperature)
        avg_t_0 = temper1_0
        fixed_rates = rate_coefficients(temper1_0)
    else:
        temper1_0 = state.t_final   # temper (slot 2), evolve_point.F90:479
        avg_t_0 = state.t_av
        fixed_rates = None
    return temper1_0, avg_t_0, fixed_rates


# jitted host-loop bodies, LRU-cached by the config's VALUE: an
# id(cfg)-keyed cache could silently serve a dead config's body after
# garbage collection + id reuse (two sequential Run3Ds in one process)
_HOST_BODY_JIT = OrderedDict()
_HOST_BODY_CACHE_MAX = 16


def _cooling_fingerprint(cooling):
    """Hashable content fingerprint of a CoolingTables pytree (five
    801-point arrays -- hashing them is microseconds)."""
    if cooling is None:
        return None
    parts = []
    for a in cooling:
        b = np.asarray(a)
        parts.append((str(b.dtype), b.shape,
                      hashlib.md5(b.tobytes()).hexdigest()))
    return tuple(parts)


def _config_key(cfg: ChemistryConfig):
    return (cfg.isothermal, cfg.epsilon, cfg.cosmo_cool_factor,
            cfg.isothermal_temperature, cfg.max_iter, cfg.thermal_chunk,
            _cooling_fingerprint(cfg.cooling))


def _host_body(cfg: ChemistryConfig, k: int = 1):
    """Jitted host-loop body running `k` masked chemistry iterations
    per dispatch (a PYTHON-unrolled sequence -- no outer lax loop, so
    the XLA:TPU nested-while fault structure never appears).  k > 1 is
    used on the compacted convergence tail, where a trip's device
    compute is microseconds and the per-dispatch round trip through
    the device tunnel (~25 ms) is the entire cost: unrolling k trips
    into one program cuts the RPC count k-fold with bit-identical
    per-cell numerics (converged cells are frozen by the active
    mask)."""
    key = (_config_key(cfg), k)
    fn = _HOST_BODY_JIT.pop(key, None)
    if fn is None:
        def body(dt, ndens, clumping, phi_HI, phi_HeI, phi_HeII,
                 phi_heat, temper0, ccf, nit0, carry):
            # isothermal host loops need the fixed T-independent rates
            # the in-graph path precomputes (cgsconstants.f90:270-289);
            # temper0 is the constant isothermal temperature grid
            fixed = (rate_coefficients(temper0) if cfg.isothermal
                     else None)
            for j in range(k):
                damp = jnp.where(nit0 + j >= DAMP_AFTER,
                                 DAMP_FACTOR, 0.0).astype(dt.dtype)
                carry = _chem_iteration(cfg, dt, ndens, clumping,
                                        phi_HI, phi_HeI, phi_HeII,
                                        phi_heat, temper0, fixed, ccf,
                                        carry, damp=damp)
            return carry, jnp.sum(carry[3].astype(jnp.int32))

        # jax.jit retraces per input shape, so the same cached callable
        # serves both the full grid and the compacted active subsets
        fn = jax.jit(body)
    _HOST_BODY_JIT[key] = fn  # (re-)insert = LRU touch
    while len(_HOST_BODY_JIT) > _HOST_BODY_CACHE_MAX:
        _HOST_BODY_JIT.popitem(last=False)
    return fn


def _host_body_split(cfg: ChemistryConfig, s0: int, phase: str):
    """Jitted phases of the two-phase (split-thermal) host trip.

    The round-4 profile showed the full-grid heating trip is ~94%
    thermal, and thermal's lockstep sub-step count (~150 at the bench
    config) is set by a tiny stiff minority (cells heated to >1e9 K
    near sources) while the typical cell finishes in a handful of
    steps.  The split trip caps the full-set lockstep at `s0`
    sub-steps (phase A), continues only the unfinished minority on a
    compacted bucket (phase B, exact per-cell continuation -- see
    thermal_substeps), and finalizes + runs the convergence test
    (phase C).  Per-cell numerics are bit-identical to the monolithic
    trip.  Reference cost model: evolve_point.F90:487-640,
    thermal.f90:110-155."""
    key = (_config_key(cfg), "split", phase, s0)
    fn = _HOST_BODY_JIT.pop(key, None)
    if fn is None:
        if phase == "A":
            def body(dt, ndens, clumping, phi_HI, phi_HeI, phi_HeII,
                     phi_heat, temper0, ccf, nit0, carry):
                ion, temper1, avg_t, active = carry
                ion_new, de = _doric_half(cfg, dt, ndens, clumping,
                                          phi_HI, phi_HeI, phi_HeII,
                                          None, ion, avg_t)
                damp = jnp.where(nit0 >= DAMP_AFTER, DAMP_FACTOR,
                                 0.0).astype(dt.dtype)
                blend = lambda new, old: new + damp * (old - new)
                ion_new = jax.tree.map(blend, ion_new, ion)
                de = electrondens(ndens, ion_new.avg)
                ctx, tcarry = thermal_init(dt, temper0, de, ndens,
                                           ion_new, phi_heat, ccf)
                tcarry, _ = thermal_substeps(cfg.cooling, dt, ctx,
                                             tcarry, 0, s0)
                # only cells still in the chemistry fixed point need
                # their sub-cycle finished; frozen cells' thermal
                # output is discarded by the freeze anyway
                unfin = tcarry.active & active
                n_unfin = jnp.sum(unfin.astype(jnp.int32))
                return ion_new, ctx, tcarry, unfin, n_unfin
        elif phase == "B":
            def body(dt, ctx_c, tcarry_c):
                tcarry_c, _ = thermal_substeps(cfg.cooling, dt, ctx_c,
                                               tcarry_c, s0,
                                               MAX_SUBSTEPS)
                return tcarry_c
        else:  # "C"
            def body(dt, carry, ion_new, ctx, tcarry, nit0):
                end_T, avg_T = thermal_finalize(ctx, tcarry, dt)
                damp = jnp.where(nit0 >= DAMP_AFTER, DAMP_FACTOR,
                                 0.0).astype(dt.dtype)
                end_T = end_T + damp * (carry[1] - end_T)
                avg_T = avg_T + damp * (carry[2] - avg_T)
                out = _conv_freeze(cfg, carry, ion_new, end_T, avg_T)
                return out, jnp.sum(out[3].astype(jnp.int32))
        fn = jax.jit(body)
    _HOST_BODY_JIT[key] = fn
    while len(_HOST_BODY_JIT) > _HOST_BODY_CACHE_MAX:
        _HOST_BODY_JIT.popitem(last=False)
    return fn


def _thermal_gather(idx, valid, ctx, tcarry):
    ctx_c, tc = _gather_rows(idx, (ctx, tcarry))
    tc = tc._replace(active=tc.active & valid)
    return ctx_c, tc


_THERMAL_GATHER_JIT = jax.jit(_thermal_gather)


# nonzero + gather fused into ONE jitted program per (shape, bucket):
# dispatched eagerly they lower to a chain of separate device RPCs,
# which through the tunnel costs hundreds of ms per compaction
# (round-5 trip profile: 446 ms at the first 524288-bucket gather)
@partial(jax.jit, static_argnums=(3,))
def _thermal_gather_fused(unfin, ctx, tcarry, bucket: int):
    nn = unfin.size
    idx = jnp.nonzero(unfin.reshape(-1), size=bucket, fill_value=nn)[0]
    valid = idx < nn
    ctx_c, tc = _thermal_gather(idx, valid, ctx, tcarry)
    return idx, ctx_c, tc


@partial(jax.jit, static_argnums=(3,))
def _compact_gather_fused(active, args, carry, bucket: int):
    n = active.size
    idx = jnp.nonzero(active.reshape(-1), size=bucket, fill_value=n)[0]
    valid = idx < n
    args_c, carry_c = _compact_gather(idx, valid, args, carry)
    return idx, args_c, carry_c


def _thermal_scatter(idx, tcarry_full, tcarry_c):
    s = lambda full, comp: full.at[idx].set(comp, mode="drop")
    return jax.tree.map(s, tcarry_full, tcarry_c)


_THERMAL_SCATTER_JIT = jax.jit(_thermal_scatter)


def _split_trip(cfg: ChemistryConfig, s0: int, dt, args, ccf, nit0,
                carry):
    """One two-phase chemistry trip (see _host_body_split).  Returns
    (carry, active_count) -- the count is fresh (synchronous), so the
    caller can compact on it immediately.  `nit0` (traced) is the
    global fixed-point iteration index, for the DAMP_AFTER rule."""
    ion_new, ctx, tcarry, unfin, n_unfin = _host_body_split(
        cfg, s0, "A")(dt, *args, ccf, nit0, carry)
    cnt = int(n_unfin)
    if cnt:
        nn = tcarry.u.size
        bucket = _bucket_for(cnt)
        if bucket < nn:
            idx, ctx_c, tc_c = _thermal_gather_fused(unfin, ctx,
                                                     tcarry, bucket)
            tc_c = _host_body_split(cfg, s0, "B")(dt, ctx_c, tc_c)
            tcarry = _THERMAL_SCATTER_JIT(idx, tcarry, tc_c)
        else:
            tcarry = _host_body_split(cfg, s0, "B")(dt, ctx, tcarry)
    carry, cnt2 = _host_body_split(cfg, s0, "C")(dt, carry, ion_new,
                                                 ctx, tcarry, nit0)
    return carry, cnt2


def _gather_rows(idx, tree):
    """Gather every leaf of `tree` at `idx` via ONE row gather of the
    stacked (n, n_leaves) matrix: separate per-array gathers lower to
    a pathological access pattern on TPU (~26 ms per 2M-element array
    vs 0.2 ms for the whole stacked gather -- round-5 measurement);
    bit-identical values (bool leaves round-trip through the float
    stack exactly)."""
    leaves, treedef = jax.tree.flatten(tree)
    dt = jnp.result_type(*[l.dtype for l in leaves
                           if l.dtype != jnp.bool_] or [jnp.float32])
    M = jnp.stack([l.astype(dt) for l in leaves], axis=-1)
    rows = M.at[idx].get(mode="clip")
    out = [rows[:, i].astype(l.dtype) for i, l in enumerate(leaves)]
    return jax.tree.unflatten(treedef, out)


def _compact_gather(idx, valid, args, carry):
    """Gather per-cell inputs + carry at the active-cell indices
    (pad lanes clip to an arbitrary cell and are masked inactive)."""
    args_c, (ion_c, t1_c, at_c, act_c) = _gather_rows(
        idx, (tuple(args), carry))
    carry_c = (ion_c, t1_c, at_c, act_c & valid)
    return args_c, carry_c


_COMPACT_GATHER_JIT = jax.jit(_compact_gather)


def _compact_scatter(idx, carry_full, carry_c):
    """Scatter a compact carry back into the full grid (pad lanes
    dropped)."""
    s = lambda full, comp: full.at[idx].set(comp, mode="drop")
    ion_f, t1_f, at_f, act_f = carry_full
    ion_c, t1_c, at_c, act_c = carry_c
    ion = jax.tree.map(s, ion_f, ion_c)
    return (ion, s(t1_f, t1_c), s(at_f, at_c), s(act_f, act_c))


_COMPACT_SCATTER_JIT = jax.jit(_compact_scatter)

# Fixed power-of-4 bucket ladder (2048, 8192, 32768, ...): every
# bucket size is a distinct XLA compile of the chemistry body, and on
# the TPU tunnel a compile costs minutes -- absolute, widely-spaced
# rungs mean at most ~5 shapes per run and the SAME shapes across
# runs, so the persistent compilation cache absorbs them once.
_BUCKET_FLOOR = 2048


def _env_int(name: str, default=None):
    """Parse an int env override once at import; a malformed value
    falls back to the default instead of raising mid-run."""
    import os
    try:
        return int(os.environ[name])
    except (KeyError, ValueError):
        return default


# tail chunking width / split-thermal cap overrides (see
# _do_chemistry_global); parsed once so a malformed value cannot raise
# deep inside a long run
_CHEM_CHUNK_ENV = _env_int("C2RAY_CHEM_CHUNK", 0)
_THERMAL_CHUNK_ENV = _env_int("C2RAY_THERMAL_CHUNK")


def _bucket_for(count: int, n: int = 0) -> int:
    """Smallest ladder rung >= count.  Rungs are powers of 4 from the
    floor, PLUS n/2 when the full set size `n` is given: early heating
    passes sit with 50-90% of cells active for a few trips (the hard
    bands touch every cell on the first iterates), and without the n/2
    rung nothing between n/4 and n exists to compact to."""
    b = _BUCKET_FLOOR
    while b < count:
        b *= 4
    if n and b >= n and count * 2 <= n:
        return n // 2
    return b


def _bucket_rungs(n: int):
    """Every bucket size a pass over n cells can touch (ladder +
    n/2), smallest first, excluding n itself."""
    rungs = []
    b = _BUCKET_FLOOR
    while b < n:
        rungs.append(b)
        b *= 4
    if n // 2 not in rungs and n // 2 >= _BUCKET_FLOOR:
        rungs.append(n // 2)
    return sorted(set(r for r in rungs if r < n))


def _do_chemistry_global(cfg: ChemistryConfig, dt, state: GridState,
                         phi_HI, phi_HeI, phi_HeII, phi_heat,
                         cosmo_cool_factor=None, host_loop=None):
    """Vectorised do_chemistry with local=.false.
    (evolve_point.F90:444-646).

    ``cosmo_cool_factor`` = 2 (dz/dt)/(1+z), the adiabatic cosmological
    cooling factor (cosmology.f90:207-234).  It is time dependent, so
    cosmological drivers pass it as a *traced* per-step scalar (like
    `dr` in the sweep) instead of baking it into the config.

    ``host_loop``: run the outer fixed-point loop at the host level,
    dispatching one jitted iteration per trip, instead of an in-graph
    ``lax.while_loop``.  REQUIRED on TPU for non-isothermal runs: an
    XLA:TPU while-loop whose body contains both doric's stiff
    exponential arithmetic and thermal's nested sub-cycle loop
    miscompiles into a device kernel fault (round-3 on-chip bisect,
    tools/fault_bisect*.py -- nothermal passes, nodoric passes, the
    pair faults at every mesh >= 64^3 regardless of gather layout,
    rematerialization, barriers, or sub-step chunking; lifting the
    outer loop to the host is the one structure that runs).  Auto:
    host level when called outside a trace on a TPU backend with
    heating on.  Inside jit/shard_map (the virtual-CPU multi-chip
    paths) the in-graph while_loop is kept.

    Returns (IonState, t_inter, t_av, n_iterations).
    """
    if cosmo_cool_factor is None:
        cosmo_cool_factor = cfg.cosmo_cool_factor
    ion0 = state.ion_state(cfg.epsilon)
    ndens = state.ndens
    clumping = state.clumping
    dtype = ndens.dtype

    temper1_0, avg_t_0, fixed_rates = _chem_setup(cfg, state)
    temper0 = temper1_0

    if host_loop is None:
        # isothermal grids use the host loop on TPU too: the in-graph
        # lockstep runs EVERY cell through every fixed-point
        # iteration -- 4-8 s/pass at 256^3, and 0.75 s at 128^3 when
        # an evolved state tips cells into the >1% oscillation regime
        # -- while the compacting host loop pays only for the active
        # set (tools/profile_256.py, round-5 bench bisect)
        host_loop = (jax.default_backend() == "tpu"
                     and not isinstance(ndens, jax.core.Tracer))

    active0 = jnp.ones_like(ndens, dtype=bool)
    if host_loop:
        # Host-dispatched fixed-point loop with active-set compaction:
        # once the unconverged fraction drops below 1/8, the loop
        # continues on a gathered compact subset (power-of-two bucket)
        # and scatters back at the end -- the reference's per-cell
        # early exit (evolve_point.F90:605-628), which the masked
        # lockstep otherwise loses, costing ~100x on the convergence
        # tail of a 128^3 grid with a handful of stiff cells.
        body = _host_body(cfg)
        # tail chunking: once the active set is compacted below
        # K_BUCKET_MAX cells, a trip's device compute (~0.1 ms / 1k
        # cells) is far below the dispatch round trip (~25 ms through
        # the tunnel), so dispatch K_TAIL unrolled trips per RPC.  At
        # larger buckets single trips stay better: the active count
        # still decays fast there, and an unrolled chunk cannot
        # recompact mid-chunk.  Measured at 128^3 x 8 heating (v5e):
        # K=8 -> 4.2 s/iter, K=32 -> 2.58 s/iter (BASELINE.md); the
        # CPU default stays 8 because a 32x-unrolled body is mostly
        # compile time there.  C2RAY_CHEM_CHUNK overrides.
        default_k = 32 if jax.default_backend() == "tpu" else 8
        K_TAIL = _CHEM_CHUNK_ENV or default_k
        K_BUCKET_MAX = 65536
        # two-phase trips pay 3 dispatches + a host sync (~60-90 ms
        # through the tunnel); below this bucket a monolithic trip's
        # lockstep thermal is cheaper than the split's fixed overhead
        K_SPLIT_MIN = 131072
        # two-phase thermal on the big-bucket phase (see
        # _host_body_split): auto-on for TPU heating runs, where the
        # stiff-minority lockstep otherwise dominates the trip
        s0 = cfg.thermal_chunk
        if s0 is None:
            s0 = 16 if jax.default_backend() == "tpu" else 0
        if _THERMAL_CHUNK_ENV is not None:
            s0 = _THERMAL_CHUNK_ENV
        use_split = bool(s0 and s0 > 0 and not cfg.isothermal)
        ccf = jnp.asarray(cosmo_cool_factor, dtype=dtype)
        dt = jnp.asarray(dt, dtype=dtype)
        n = ndens.size
        args_full = (ndens, clumping, phi_HI, phi_HeI, phi_HeII,
                     phi_heat, temper0)
        if clumping.ndim == 0:
            args_full = (ndens, jnp.broadcast_to(clumping, ndens.shape),
                         phi_HI, phi_HeI, phi_HeII, phi_heat, temper0)
        carry = (ion0, temper1_0, avg_t_0, active0)
        args = args_full
        carry_full = None
        idx = None
        bucket = n
        nit = 0
        # Depth-2 dispatch pipeline: trip k+1 is enqueued before the
        # host blocks on trip k's convergence count, so the device
        # never idles on the host<->device round trip (through the
        # tunnel the RTT can rival a whole small trip).  The extra
        # trip dispatched past convergence is numerically a no-op (an
        # empty active mask keeps every value).
        pending = []
        while nit < cfg.max_iter:
            if use_split and bucket > K_SPLIT_MIN:
                # two-phase trip.  Read its convergence count
                # synchronously: phase A already syncs once inside the
                # trip, so the marginal round trip is small, and a
                # fresh count compacts THIS trip's active set -- the
                # pipelined (stale) count costs one oversized trip at
                # every rung of the early-pass descent
                carry, cnt = _split_trip(cfg, s0, dt, args, ccf,
                                         jnp.int32(nit), carry)
                nit += 1
                count = int(cnt)
            else:
                k = (min(K_TAIL, cfg.max_iter - nit)
                     if idx is not None and bucket <= K_BUCKET_MAX
                     else 1)
                # quantize the chunk length to a power of 2: the
                # remainder before the max_iter cap varies pass to
                # pass, and an un-quantized k means a fresh k-unrolled
                # body compile (seconds through the tunnel) in almost
                # every pass; {1,2,4,...,K_TAIL} is a fixed, warmable
                # shape set and still lands exactly on max_iter
                if k > 1:
                    k = 1 << (k.bit_length() - 1)
                carry, cnt = (_host_body(cfg, k) if k > 1
                              else body)(dt, *args, ccf,
                                         jnp.int32(nit), carry)
                nit += k
                pending.append((cnt, k))
                if len(pending) < 2 and nit < cfg.max_iter:
                    continue
                count, _ = pending.pop(0)
                count = int(count)
            if count == 0:
                # everything dispatched after the converged chunk was a
                # masked no-op; don't count those trips in nit
                nit -= sum(kk for _, kk in pending)
                pending.clear()
                break
            # (re-)compact to the bucket ladder whenever it offers a
            # shrink (rungs are 4x apart, so this fires at most ~6
            # times a pass -- no thrash); the stale pipelined count is
            # safe because the active set only ever shrinks
            new_bucket = _bucket_for(count, n)
            if new_bucket < bucket:
                pending.clear()  # drain before reshaping the work set
                if idx is not None:
                    carry = _COMPACT_SCATTER_JIT(idx, carry_full, carry)
                carry_full = carry
                bucket = new_bucket
                if bucket >= n:
                    idx = None
                    args = args_full
                    continue
                idx, args, carry = _compact_gather_fused(
                    carry[3], args_full, carry, bucket)
        while pending:
            cnt, _ = pending.pop(0)
            if int(cnt) == 0:
                nit -= sum(kk for _, kk in pending)
                break
        if idx is not None:
            carry = _COMPACT_SCATTER_JIT(idx, carry_full, carry)
        ion, temper1, avg_t, _ = carry
        return ion, temper1, avg_t, nit

    def cond(carry):
        ion, temper1, avg_t, nit, active = carry
        return jnp.any(active) & (nit < cfg.max_iter)

    def body(carry):
        ion, temper1, avg_t, nit, active = carry
        damp = jnp.where(nit >= DAMP_AFTER, DAMP_FACTOR,
                         0.0).astype(ndens.dtype)
        out = _chem_iteration(cfg, dt, ndens, clumping, phi_HI,
                              phi_HeI, phi_HeII, phi_heat, temper0,
                              fixed_rates, cosmo_cool_factor,
                              (ion, temper1, avg_t, active),
                              damp=damp)
        ion, temper1, avg_t, active = out
        return (ion, temper1, avg_t, nit + 1, active)

    carry = (ion0, temper1_0, avg_t_0, jnp.int32(0), active0)
    ion, temper1, avg_t, nit, _ = jax.lax.while_loop(cond, body, carry)
    return ion, temper1, avg_t, nit


def _finalize_pass(state: GridState, ion: IonState, t_inter, t_av
                   ) -> Tuple[GridState, jnp.ndarray]:
    """Global convergence counting + state write-back
    (evolve_point.F90:399-435)."""
    def big_change(new, old):
        return ((jnp.abs(new - old) > MIN_FRACTIONAL_CHANGE)
                & (jnp.abs((new - old) / new) > MIN_FRACTIONAL_CHANGE)
                & (new > MIN_FRACTION_OF_ATOMS))

    changed = (big_change(ion.avg.h0, state.h_av0)
               | big_change(ion.avg.he0, state.he_av0)
               | big_change(ion.avg.he2, state.he_av2)
               | ((jnp.abs((state.t_av - t_av) / t_av) > 1.0e-1)
                  & (jnp.abs(t_av - state.t_av) > 100.0)))
    conv_flag = jnp.sum(changed.astype(jnp.int32))

    new_state = state._replace(
        h_int0=ion.cur.h0, h_int1=ion.cur.h1,
        he_int0=ion.cur.he0, he_int1=ion.cur.he1, he_int2=ion.cur.he2,
        h_av0=ion.avg.h0, h_av1=ion.avg.h1,
        he_av0=ion.avg.he0, he_av1=ion.avg.he1, he_av2=ion.avg.he2,
        t_inter=t_inter, t_av=t_av,
    )
    return new_state, conv_flag


_FINALIZE_JIT = jax.jit(_finalize_pass)


def global_chemistry_pass(cfg: ChemistryConfig, state: GridState,
                          rates: RateGrids, dt, cosmo_cool_factor=None,
                          host_loop=None) -> Tuple[GridState, jnp.ndarray]:
    """evolve0D_global over the whole grid (evolve_point.F90:325-440).

    Returns (new state, conv_flag = number of non-converged cells).
    See _do_chemistry_global for the `host_loop` contract (the XLA:TPU
    nested-loop fault workaround).
    """
    ion, t_inter, t_av, _ = _do_chemistry_global(
        cfg, dt, state, rates.phih, rates.phihe0, rates.phihe1,
        rates.phiheat, cosmo_cool_factor, host_loop=host_loop)

    if isinstance(state.ndens, jax.core.Tracer):
        return _finalize_pass(state, ion, t_inter, t_av)
    return _FINALIZE_JIT(state, ion, t_inter, t_av)


def warm_host_shapes(cfg: ChemistryConfig, n: int, dtype=None,
                     verbose: bool = False):
    """Pre-build every host-loop body shape a chemistry pass over `n`
    cells can touch (full set, each bucket rung, tail chunk bodies,
    fused gathers), so first-use compilation/deserialization never
    lands inside a timed or production iteration.

    A heating pass visits a data-dependent subset of the bucket ladder
    each time; through the device tunnel the first use of a shape costs
    seconds (persistent-cache load) to minutes (cold compile).  Calling
    this once up front (e.g. in a bench warm-up, or at driver start)
    makes every later pass's shape set warm.  No-op on cached shapes.
    """
    import jax as _jax
    import jax.numpy as _jnp

    if dtype is None:
        dtype = (_jnp.float32
                 if _jax.default_backend() == "tpu" else _jnp.float64)
    default_k = 32 if _jax.default_backend() == "tpu" else 8
    K_TAIL = _CHEM_CHUNK_ENV or default_k
    s0 = cfg.thermal_chunk
    if s0 is None:
        s0 = 16 if _jax.default_backend() == "tpu" else 0
    if _THERMAL_CHUNK_ENV is not None:
        s0 = _THERMAL_CHUNK_ENV
    use_split = bool(s0 and s0 > 0 and not cfg.isothermal)
    K_BUCKET_MAX = 65536
    K_SPLIT_MIN = 131072

    def dummy(size):
        one = _jnp.ones((size,), dtype=dtype)
        frac = IonFractions(h0=one * 0.5, h1=one * 0.5, he0=one * 0.5,
                            he1=one * 0.25, he2=one * 0.25)
        ion = IonState(cur=frac, avg=frac, old=frac)
        temper = one * 1.0e4
        args = (one * 1e-4, one, one * 1e-12, one * 1e-13, one * 1e-14,
                one * 1e-28, temper)
        carry = (ion, temper, temper, one > 0.0)
        return args, carry

    dt = _jnp.asarray(1.0e10, dtype=dtype)
    ccf = _jnp.asarray(0.0, dtype=dtype)

    def guard(fn, *a):
        # the remote-compile tunnel can drop transiently; a failed
        # warm shape is retried once, then skipped (it will compile
        # on first real use instead -- slower, never wrong)
        for attempt in (0, 1):
            try:
                return fn(*a)
            except Exception as e:  # pragma: no cover - tunnel flake
                if attempt:
                    import warnings
                    warnings.warn(f"warm_host_shapes: shape skipped "
                                  f"({e})", stacklevel=2)
                    return None

    sizes = _bucket_rungs(n) + [n]
    for size in sizes:
        args, carry = dummy(size)
        nit0 = _jnp.int32(0)
        if size > K_SPLIT_MIN and use_split:
            out = guard(_host_body_split(cfg, s0, "A"),
                        dt, *args, ccf, nit0, carry)
            if out is None:
                continue
            ion_new, ctx, tcarry, unfin, _ = out
            # B at every thermal rung below this size, plus full-set B
            for b in _bucket_rungs(size) + [size]:
                if b < size:
                    g = guard(_thermal_gather_fused, unfin, ctx,
                              tcarry, b)
                    if g is None:
                        continue
                    idx, ctx_c, tc_c = g
                    guard(_host_body_split(cfg, s0, "B"), dt, ctx_c,
                          tc_c)
                    guard(_THERMAL_SCATTER_JIT, idx, tcarry, tc_c)
                else:
                    guard(_host_body_split(cfg, s0, "B"), dt, ctx,
                          tcarry)
            guard(_host_body_split(cfg, s0, "C"), dt, carry, ion_new,
                  ctx, tcarry, nit0)
        else:
            if size <= K_BUCKET_MAX:
                # every power-of-2 chunk length the quantized tail can
                # dispatch at this rung
                k = K_TAIL
                while k > 1:
                    guard(_host_body(cfg, k), dt, *args, ccf, nit0,
                          carry)
                    k //= 2
            guard(_host_body(cfg, 1), dt, *args, ccf, nit0, carry)
        if verbose:
            print(f"# warm_host_shapes: {size} done", flush=True)
    # outer fused compaction gathers: (full shape -> each rung)
    args, carry = dummy(n)
    for b in _bucket_rungs(n):
        guard(_compact_gather_fused, carry[3], args, carry, b)
        idx = _jnp.zeros((b,), _jnp.int32)
        cc = guard(_COMPACT_GATHER_JIT, idx, idx < n, args, carry)
        if cc is not None:
            guard(_COMPACT_SCATTER_JIT, idx, carry, cc[1])
