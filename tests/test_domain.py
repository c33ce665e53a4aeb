"""Spatial domain decomposition of the sweep (parallel/domain.py).

The de-novo TPU parallel mechanism (SURVEY.md section 2.5.6/section 7
step 6): grid fields sharded into x-slabs, boundary planes exchanged
with ppermute, windowed pyramid traces per owning device, rate halos
folded back.  Differential-tested against the replicated single-device
engine at the same static subbox radius.
"""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from c2ray_tpu import constants as const
from c2ray_tpu.parallel import (ParallelConfig, domain_evolve3d,
                                group_sources_by_slab,
                                make_domain_iteration, max_domain_radius,
                                shard_state_slabs)
from c2ray_tpu.parallel.domain import exchange_slab_halo, fold_slab_halo
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.state import begin_timestep, initial_grid_state
from c2ray_tpu.sweep import SweepConfig, build_shell_table
from c2ray_tpu.sweep.evolve3d import (Evolve3DConfig, evolve3d,
                                      make_evolve3d_iteration)
from c2ray_tpu.sweep.global_pass import ChemistryConfig

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 devices")


def _setup(M=16, isothermal=True, coldensh_LLS=0.0):
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=1.0e49)),
        isothermal=isothermal, dtype=jnp.float64)
    dr = 14.0 * const.kpc / M
    cooling = None
    if not isothermal:
        from c2ray_tpu.cooling import setup_cooling_tables
        cooling = setup_cooling_tables(dtype=jnp.float64)
    cfg = Evolve3DConfig(
        sweep=SweepConfig(tables=tables, mesh=M, dr=dr,
                          isothermal=isothermal,
                          coldensh_LLS=coldensh_LLS,
                          flux_scale=bands.flux_scale),
        chem=ChemistryConfig(cooling=cooling, isothermal=isothermal,
                             isothermal_temperature=1.0e4),
        shells=build_shell_table(M),
    )
    state = initial_grid_state(np.full((M, M, M), 1.0e-3), 0.0, 0.0, 0.0,
                               1.0e4)
    return cfg, state


# ---------------------------------------------------------------------------
# halo-exchange primitives
# ---------------------------------------------------------------------------

@needs8
@pytest.mark.parametrize("H", [1, 2, 5])   # 5 > S=2: multi-hop
def test_halo_exchange_and_fold(H):
    """exchange gathers the right periodic neighbor planes; fold is its
    adjoint (scatter-add back to the owners)."""
    from jax import shard_map

    D = 8
    S, M = 2, 16     # 16 planes over 8 devices
    mesh = Mesh(np.array(jax.devices()[:D]), ("d",))
    x = np.arange(M * 3.0).reshape(M, 3)

    ex = shard_map(lambda s: exchange_slab_halo(s, H), mesh=mesh,
                   in_specs=P("d"), out_specs=P("d"))
    got = np.asarray(jax.jit(ex)(jnp.asarray(x)))
    # device d's block of the output is [d*S-H, (d+1)*S+H) periodic
    got = got.reshape(D, S + 2 * H, 3)
    for d in range(D):
        idx = (np.arange(d * S - H, (d + 1) * S + H)) % M
        np.testing.assert_array_equal(got[d], x[idx])

    # fold: ones in every extended slab must deposit 1 + 2H/S-worth of
    # overlap back; total mass is conserved
    fo = shard_map(lambda s: fold_slab_halo(s, H), mesh=mesh,
                   in_specs=P("d"), out_specs=P("d"))
    ones = jnp.ones((D * (S + 2 * H), 3))
    folded = np.asarray(jax.jit(fo)(ones))
    assert folded.shape == (M, 3)
    np.testing.assert_allclose(folded.sum(), D * (S + 2 * H) * 3)
    # every plane is covered by its own slab plus the halos of its
    # neighbors; with uniform input the deposit count is uniform
    np.testing.assert_allclose(folded, np.full_like(folded, folded[0, 0]))


# ---------------------------------------------------------------------------
# differential: sharded windowed sweep == replicated subbox sweep
# ---------------------------------------------------------------------------

@needs8
@pytest.mark.parametrize("radius", [5, 7])   # H=6 > S=2 multi-hop; 7=max
def test_domain_iteration_matches_replicated(radius):
    cfg, state = _setup(M=16)
    M = cfg.sweep.mesh
    rng = np.random.RandomState(7)
    nsrc = 6
    srcpos = rng.randint(0, M, (nsrc, 3)).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, nsrc),
                             np.zeros((nsrc, 2))])
    dt = jnp.float64(5e13)
    state0 = begin_timestep(state)

    it1 = make_evolve3d_iteration(cfg, radius=radius)
    s1, conv1, pl1, _ = it1(state0, jnp.asarray(srcpos),
                            jnp.asarray(nflux), dt)

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh)
    itd = make_domain_iteration(pcfg, radius)
    sp, nf = group_sources_by_slab(srcpos, nflux, M, 8)
    st8 = shard_state_slabs(state0, mesh)
    s8, conv8, pl8, _ = itd(st8, jnp.asarray(sp), jnp.asarray(nf), dt)

    # the state stays slab-sharded end to end (mesh^3/D per device)
    assert s8.ndens.sharding.spec == P("d")
    shard_sizes = {sh.data.size for sh in s8.h_av1.addressable_shards}
    assert shard_sizes == {M**3 // 8}

    # window-accumulate + halo-fold sums in a different order than the
    # replicated full-cube reduction: agreement is f64-rounding-level
    np.testing.assert_allclose(np.asarray(s8.h_av1),
                               np.asarray(s1.h_av1), rtol=5e-11)
    # tiny HeIII fractions amplify the rate-level rounding through
    # doric's stiff exponentials; compare at absolute f64 noise level
    np.testing.assert_allclose(np.asarray(s8.he_av2),
                               np.asarray(s1.he_av2), rtol=1e-7,
                               atol=1e-14)
    np.testing.assert_allclose(float(pl8), float(pl1), rtol=1e-11)
    assert int(conv8) == int(conv1)


@needs8
def test_domain_evolve3d_matches_replicated_full_step():
    """Full convergence loop, non-isothermal, fixed radius."""
    cfg, state = _setup(M=16, isothermal=False)
    M = cfg.sweep.mesh
    srcpos = np.array([[8, 8, 8], [3, 12, 5]], dtype=np.int32)
    nflux = np.array([[1.0, 0, 0], [0.7, 0, 0]])
    dt = 5e13
    r = 6

    s1, st1 = evolve3d(cfg, state, jnp.asarray(srcpos),
                       jnp.asarray(nflux), dt,
                       iteration_fn=make_evolve3d_iteration(cfg, radius=r))

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh)
    s8, st8 = domain_evolve3d(pcfg, shard_state_slabs(state, mesh),
                              srcpos, nflux, dt, radius=r)

    assert st8.n_iterations == st1.n_iterations
    np.testing.assert_allclose(np.asarray(s8.h1), np.asarray(s1.h1),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(s8.t_final),
                               np.asarray(s1.t_final), rtol=1e-10)


@needs8
def test_domain_lls_grid_matches_scalar():
    """A constant per-cell LLS grid must reproduce the homogeneous
    scalar LLS model (type 1 vs type 2, mat_ini_test.F90:640-763), and
    the LLS photon loss must be accounted."""
    lls_col = 2.0e21
    cfg_s, state = _setup(M=16, coldensh_LLS=lls_col)
    cfg_g, _ = _setup(M=16)
    M = 16
    srcpos = np.array([[8, 8, 8]], dtype=np.int32)
    nflux = np.array([[1.0, 0, 0]])
    dt = jnp.float64(5e13)
    state0 = begin_timestep(state)
    r = 6

    it_s = make_evolve3d_iteration(cfg_s, radius=r)
    s1, _, pl1, lls1 = it_s(state0, jnp.asarray(srcpos),
                            jnp.asarray(nflux), dt)
    assert float(lls1) > 0.0

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg_g, mesh=mesh)
    itd = make_domain_iteration(pcfg, r)
    sp, nf = group_sources_by_slab(srcpos, nflux, M, 8)
    grid = jnp.full((M**3,), lls_col, dtype=jnp.float64)
    s8, _, pl8, lls8 = itd(shard_state_slabs(state0, mesh),
                           jnp.asarray(sp), jnp.asarray(nf), dt,
                           lls_grid=grid)

    np.testing.assert_allclose(np.asarray(s8.h_av1),
                               np.asarray(s1.h_av1), rtol=5e-11)
    np.testing.assert_allclose(float(lls8), float(lls1), rtol=1e-11)


def test_max_domain_radius():
    # the full periodic trace (+M/2 / -(M/2-1)) is supported
    assert max_domain_radius(16) == 8
    assert max_domain_radius(128) == 64


@needs8
def test_domain_full_extent_matches_replicated():
    """At radius M/2 the domain window spans the whole torus and must
    reproduce the replicated engine's full periodic trace
    (+M/2 / -(M/2-1), evolve_source.F90:103-109) -- no radius cap."""
    cfg, state = _setup(M=16)
    M = cfg.sweep.mesh
    rng = np.random.RandomState(3)
    nsrc = 5
    srcpos = rng.randint(0, M, (nsrc, 3)).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, nsrc),
                             np.zeros((nsrc, 2))])
    dt = jnp.float64(5e13)
    state0 = begin_timestep(state)

    it1 = make_evolve3d_iteration(cfg)            # full trace
    s1, conv1, pl1, _ = it1(state0, jnp.asarray(srcpos),
                            jnp.asarray(nflux), dt)

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh)
    itd = make_domain_iteration(pcfg, M // 2)
    sp, nf = group_sources_by_slab(srcpos, nflux, M, 8)
    s8, conv8, pl8, _ = itd(shard_state_slabs(state0, mesh),
                            jnp.asarray(sp), jnp.asarray(nf), dt)

    np.testing.assert_allclose(np.asarray(s8.h_av1),
                               np.asarray(s1.h_av1), rtol=5e-11)
    np.testing.assert_allclose(np.asarray(s8.he_av2),
                               np.asarray(s1.he_av2), rtol=1e-7,
                               atol=1e-14)
    np.testing.assert_allclose(float(pl8), float(pl1), rtol=1e-11,
                               atol=1e-30)
    assert int(conv8) == int(conv1)


@needs8
def test_domain_balanced_assignment_matches_and_balances():
    """A clustered catalog (all sources in one slab) spreads over the
    eligible devices with per-device counts within +-1, and the result
    matches both the owner-only grouping and the replicated engine."""
    from c2ray_tpu.parallel import group_sources_balanced

    cfg, state = _setup(M=16)
    M, D, S = 16, 8, 2
    rng = np.random.RandomState(11)
    nsrc = 8
    # all sources in slab 2 (x in [4, 5]): owner-only would idle 7/8
    srcpos = np.column_stack([
        rng.randint(4, 6, nsrc),
        rng.randint(0, M, nsrc), rng.randint(0, M, nsrc),
    ]).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, nsrc),
                             np.zeros((nsrc, 2))])
    E = 2 * S   # eligibility reaches ~2 slabs each side (~5 devices)
    sp, nf = group_sources_balanced(srcpos, nflux, M, D, E)
    counts = np.any(nf.reshape(D, -1, 3) > 0, axis=2).sum(axis=1)
    # owner-only grouping puts all 8 on device 2 (K=8); balanced
    # spreads them so the max per-device load -- which sets the padded
    # scan length K, i.e. the wall time -- drops to ceil(8/5)=2
    assert counts.max() <= 2
    assert (counts > 0).sum() >= 5
    assert nf.shape[0] == D * counts.max()

    dt = jnp.float64(5e13)
    state0 = begin_timestep(state)
    r = 5
    it1 = make_evolve3d_iteration(cfg, radius=r)
    s1, conv1, pl1, _ = it1(state0, jnp.asarray(srcpos),
                            jnp.asarray(nflux), dt)

    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh)
    itd = make_domain_iteration(pcfg, r, extra_halo=E)
    s8, conv8, pl8, _ = itd(shard_state_slabs(state0, mesh),
                            jnp.asarray(sp), jnp.asarray(nf), dt)
    np.testing.assert_allclose(np.asarray(s8.h_av1),
                               np.asarray(s1.h_av1), rtol=5e-11)
    np.testing.assert_allclose(float(pl8), float(pl1), rtol=1e-11)
    assert int(conv8) == int(conv1)


@needs8
def test_domain_iterdump_resume(tmp_path):
    """Mid-iteration checkpoint in the domain mode: dump every
    iteration, then resume from the dump and get the same final state
    as the uninterrupted run (evolve.F90:199-212, 279-367)."""
    from c2ray_tpu.parallel import domain_evolve3d

    cfg, state = _setup(M=16)
    M = cfg.sweep.mesh
    srcpos = np.array([[8, 8, 8], [3, 12, 5]], dtype=np.int32)
    nflux = np.array([[1.0, 0, 0], [0.7, 0, 0]])
    dt = 5e13
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh)
    st0 = shard_state_slabs(state, mesh)

    # uninterrupted run (dumping every iteration as a side effect)
    s_ref, stats_ref = domain_evolve3d(
        pcfg, st0, srcpos, nflux, dt, radius=6,
        dump_dir=str(tmp_path), dump_interval_s=0.0)
    assert stats_ref.n_iterations >= 2

    # the last dump was written at iteration n; resuming from it must
    # reproduce the uninterrupted final state
    import numpy as _np
    from c2ray_tpu.io.checkpoint import load_iterdump
    from c2ray_tpu.state import GridState
    from c2ray_tpu.sweep.source_sweep import RateGrids

    niter_dumped, _, _ = load_iterdump(str(tmp_path), GridState,
                                       RateGrids)
    assert niter_dumped >= 1
    s_res, stats_res = domain_evolve3d(
        pcfg, st0, srcpos, nflux, dt, radius=6,
        dump_dir=str(tmp_path), dump_interval_s=1e9,
        start_from_dump=True)
    assert (stats_res.n_iterations == stats_ref.n_iterations)
    # the resume path re-applies the chemistry pass on gathered host
    # arrays (different reduction layout): f64-rounding-level agreement
    _np.testing.assert_allclose(_np.asarray(s_res.h1),
                                _np.asarray(s_ref.h1), rtol=1e-10)
    _np.testing.assert_allclose(_np.asarray(s_res.t_final),
                                _np.asarray(s_ref.t_final), rtol=1e-10)


@needs8
def test_parallel_iterdump_resume(tmp_path):
    """Same checkpoint protocol in the source-parallel replicated mode
    (parallel_evolve3d)."""
    from c2ray_tpu.parallel import parallel_evolve3d

    cfg, state = _setup(M=16)
    srcpos = np.array([[8, 8, 8], [3, 12, 5]], dtype=np.int32)
    nflux = np.array([[1.0, 0, 0], [0.7, 0, 0]])
    dt = 5e13
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh)

    s_ref, stats_ref = parallel_evolve3d(
        pcfg, state, srcpos, nflux, dt,
        dump_dir=str(tmp_path), dump_interval_s=0.0)
    assert stats_ref.n_iterations >= 2

    s_res, stats_res = parallel_evolve3d(
        pcfg, state, srcpos, nflux, dt,
        dump_dir=str(tmp_path), dump_interval_s=1e9,
        start_from_dump=True)
    assert stats_res.n_iterations == stats_ref.n_iterations
    np.testing.assert_allclose(np.asarray(s_res.h1),
                               np.asarray(s_ref.h1), rtol=1e-10)


@needs8
def test_run3d_parallel_domain_driver(tmp_path):
    """The driver runs the grid-sharded mode end to end
    (Run3DConfig.parallel='domain') and the state stays slab-sharded."""
    from c2ray_tpu.driver import Run3D, Run3DConfig
    from c2ray_tpu.io.writers import OutputStreams
    from c2ray_tpu.nbody import test_nbody as make_test_nbody
    from c2ray_tpu.radiation.sed import BlackBodySED
    from c2ray_tpu.sources import SourceList

    Mm = 16
    config = Run3DConfig(
        mesh=Mm, nbody=make_test_nbody(),
        sed=SEDConfig(bb=BlackBodySED(T_eff=5.0e4, S_star=3e56)),
        isothermal=True, steps_per_slice=1,
        results_dir=str(tmp_path / "results"),
        dump_dir=str(tmp_path), streams=OutputStreams(),
        parallel="domain", n_devices=8,
    )
    run = Run3D(config)
    run.init_uniform_material()
    sources = SourceList(srcpos=np.array([[8, 8, 8]], dtype=np.int32),
                         nflux=np.array([[1.0, 0.0, 0.0]]))
    stats = run.run_slice(0, sources, write_output=False)
    assert stats[0].n_iterations >= 2
    assert run.state.ndens.sharding.spec == P("d")
    h1 = np.asarray(run.state.h1).reshape(Mm, Mm, Mm)
    assert h1[8, 8, 8] > 0.9

    # source-parallel replicated mode too
    config2 = Run3DConfig(
        mesh=Mm, nbody=make_test_nbody(),
        sed=SEDConfig(bb=BlackBodySED(T_eff=5.0e4, S_star=3e56)),
        isothermal=True, steps_per_slice=1,
        results_dir=str(tmp_path / "results2"),
        dump_dir=str(tmp_path), streams=OutputStreams(),
        parallel="source", n_devices=8,
    )
    run2 = Run3D(config2)
    run2.init_uniform_material()
    run2.run_slice(0, sources, write_output=False)
    h1b = np.asarray(run2.state.h1).reshape(Mm, Mm, Mm)
    assert h1b[8, 8, 8] > 0.9
    # both modes agree inside the common trace region: the domain
    # window caps at radius (M-2)/2 = 7, so the replicated engine's
    # extra +8-offset wrap planes are excluded (at production meshes
    # the subbox is far smaller than the box and this edge vanishes)
    off = np.arange(Mm) - 8
    inside = np.abs(off) <= 7
    m = np.ix_(inside, inside, inside)
    np.testing.assert_allclose(h1[m], h1b[m], rtol=0.05, atol=1e-6)
