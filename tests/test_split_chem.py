"""The TPU-viable multi-chip heating structure: chemistry lifted out of
shard_map to a host-driven loop of jitted cell-sharded trips.

On real TPUs an in-graph lax.while_loop whose body holds both doric and
thermal faults (round-3 bisect, global_pass._do_chemistry_global); the
parallel paths therefore split {sharded sweep} from {host-looped
chemistry}.  These tests pin the split path equal to the in-graph path
on the virtual 8-device CPU mesh -- the exact code path a TPU pod takes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from c2ray_tpu import constants as const
from c2ray_tpu.cooling import setup_cooling_tables
from c2ray_tpu.parallel import (ParallelConfig, group_sources_by_slab,
                                make_domain_iteration,
                                make_parallel_iteration, pad_sources,
                                shard_state_slabs)
from c2ray_tpu.radiation import BlackBodySED, SEDConfig
from c2ray_tpu.radiation.quadrature import build_quadrature_tables
from c2ray_tpu.state import begin_timestep, initial_grid_state
from c2ray_tpu.sweep import SweepConfig, build_shell_table
from c2ray_tpu.sweep.evolve3d import Evolve3DConfig
from c2ray_tpu.sweep.global_pass import ChemistryConfig


def _heating_setup(M=16):
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=1.0e5, S_star=1.0e49)),
        isothermal=False, dtype=jnp.float64)
    dr = 14.0 * const.kpc / M
    cfg = Evolve3DConfig(
        sweep=SweepConfig(tables=tables, mesh=M, dr=dr, isothermal=False,
                          flux_scale=bands.flux_scale),
        chem=ChemistryConfig(cooling=setup_cooling_tables(),
                             isothermal=False),
        shells=build_shell_table(M),
    )
    state = initial_grid_state(np.full((M, M, M), 1.0e-3), 0.0, 0.0, 0.0,
                               100.0)
    return cfg, state


def _compare(s_a, s_b, conv_a, conv_b):
    assert int(conv_a) == int(conv_b)
    for name in ("h_av1", "h_int1", "he_av2", "t_av", "t_inter"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_a, name)),
            np.asarray(getattr(s_b, name)), rtol=1e-9, atol=1e-14,
            err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_parallel_split_chem_matches_ingraph():
    """Source-parallel heating: host-split chemistry == fused shard_map."""
    cfg, state = _heating_setup()
    M = cfg.sweep.mesh
    rng = np.random.RandomState(3)
    srcpos = rng.randint(0, M, (5, 3)).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, 5), np.zeros((5, 2))])
    dt = jnp.float64(4e13)
    state0 = begin_timestep(state)

    mesh_dev = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)
    sp, nf = pad_sources(srcpos, nflux, 8)
    sp, nf = jnp.asarray(sp), jnp.asarray(nf)

    it_graph = make_parallel_iteration(pcfg, split_chem=False)
    s_g, conv_g, pl_g, _ = it_graph(state0, sp, nf, dt)

    it_split = make_parallel_iteration(pcfg, split_chem=True)
    s_s, conv_s, pl_s, _ = it_split(state0, sp, nf, dt)

    _compare(s_s, s_g, conv_s, conv_g)
    np.testing.assert_allclose(float(pl_s), float(pl_g), rtol=1e-12)
    # the split path keeps the chemistry cell-sharded across devices
    assert len(s_s.h_av1.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_domain_split_chem_matches_ingraph():
    """Domain-decomposed heating: host-split chemistry == fused shard_map."""
    cfg, state = _heating_setup()
    M = cfg.sweep.mesh
    rng = np.random.RandomState(4)
    srcpos = rng.randint(0, M, (4, 3)).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, 4), np.zeros((4, 2))])
    dt = jnp.float64(4e13)
    state0 = begin_timestep(state)

    mesh_dev = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)
    sp, nf = group_sources_by_slab(srcpos, nflux, M, 8)
    sp, nf = jnp.asarray(sp), jnp.asarray(nf)
    st8 = shard_state_slabs(state0, mesh_dev)
    radius = 5

    it_graph = make_domain_iteration(pcfg, radius, split_chem=False)
    s_g, conv_g, pl_g, _ = it_graph(st8, sp, nf, dt)

    it_split = make_domain_iteration(pcfg, radius, split_chem=True)
    s_s, conv_s, pl_s, _ = it_split(st8, sp, nf, dt)

    _compare(s_s, s_g, conv_s, conv_g)
    np.testing.assert_allclose(float(pl_s), float(pl_g), rtol=1e-12)
    # every field stays slab-sharded through the host-driven chemistry
    sizes = {sh.data.size for sh in s_s.h_int1.addressable_shards}
    assert sizes == {M ** 3 // 8}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_domain_single_device_offset():
    """Domain mode with n_dev=1 must handle sources at x >= mesh/2: the
    centered periodic fold would produce a negative window start that
    XLA's dynamic_slice silently clamps (round-3 advisor, medium)."""
    from c2ray_tpu.sweep.evolve3d import make_evolve3d_iteration

    cfg, state = _heating_setup(M=12)
    M = cfg.sweep.mesh
    # source deep in the upper half of the grid
    srcpos = np.array([[M - 2, 3, 7]], dtype=np.int32)
    nflux = np.array([[1.0, 0.0, 0.0]])
    dt = jnp.float64(4e13)
    state0 = begin_timestep(state)

    it1 = make_evolve3d_iteration(cfg, radius=5)
    s_ref, conv_ref, _, _ = it1(state0, jnp.asarray(srcpos),
                                jnp.asarray(nflux), dt)

    mesh_dev = Mesh(np.array(jax.devices()[:1]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)
    sp, nf = group_sources_by_slab(srcpos, nflux, M, 1)
    assert sp[0, 0] == M - 2  # absolute coordinate, not centered fold
    it_d = make_domain_iteration(pcfg, 5)
    st1 = shard_state_slabs(state0, mesh_dev)
    s_d, conv_d, _, _ = it_d(st1, jnp.asarray(sp), jnp.asarray(nf), dt)

    _compare(s_d, s_ref, conv_d, conv_ref)


def test_host_body_cache_two_configs():
    """Two sequential chemistry configs in one process must each get
    their own jitted body: the round-3 id(cfg)-keyed cache could serve
    a garbage-collected config's body to a new config reusing the id
    (VERDICT r3 weak #3)."""
    import gc

    from c2ray_tpu.sweep.global_pass import global_chemistry_pass
    from c2ray_tpu.sweep.source_sweep import RateGrids

    M = 6
    n = M ** 3
    rng = np.random.RandomState(5)
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4))
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-14, -9, n)),
        phihe0=jnp.asarray(10 ** rng.uniform(-15, -10, n)),
        phihe1=jnp.asarray(10 ** rng.uniform(-16, -11, n)),
        phiheat=jnp.asarray(10 ** rng.uniform(-32, -26, n)),
        photon_loss=jnp.zeros(()), lls_loss=jnp.zeros(()))
    dt = 1.0e13

    cooling = setup_cooling_tables()
    # config A: normal cooling; run through the host loop (caches body)
    cfg_a = ChemistryConfig(cooling=cooling, isothermal=False)
    s_a, c_a = global_chemistry_pass(cfg_a, state, rates, dt,
                                     host_loop=True)
    t_a = np.asarray(s_a.t_av).copy()
    del cfg_a
    gc.collect()

    # config B: cooling scaled 100x -- may reuse config A's id()
    cooling_hot = type(cooling)(*[c * 100.0 for c in cooling])
    cfg_b = ChemistryConfig(cooling=cooling_hot, isothermal=False)
    s_b_host, _ = global_chemistry_pass(cfg_b, state, rates, dt,
                                        host_loop=True)
    s_b_graph, _ = global_chemistry_pass(cfg_b, state, rates, dt,
                                         host_loop=False)
    # the host loop must use config B's tables, not a stale body.
    # (rtol: the stiffened 100x cooling puts occasional cells one
    # adaptive thermal sub-step apart between the two compiled variants
    # of the same body -- a ~1e-7 envelope that predates the cache fix
    # and is unrelated to it; a stale body would be off by ~100x.)
    np.testing.assert_allclose(np.asarray(s_b_host.t_av),
                               np.asarray(s_b_graph.t_av),
                               rtol=1e-5, atol=1e-12)
    assert not np.allclose(np.asarray(s_b_host.t_av), t_a, rtol=1e-3)


@pytest.mark.slow
def test_host_loop_chunked_cap_parity():
    """When the 400-style iteration cap binds, the chunked tail must
    stop at EXACTLY max_iter trips (k = min(K_TAIL, remaining)), or
    capped cells get extra iterations the while_loop path never ran.
    max_iter=21 is not divisible by the chunk size on purpose."""
    from c2ray_tpu.sweep.global_pass import global_chemistry_pass
    from c2ray_tpu.sweep.source_sweep import RateGrids

    M = 16  # 4096 cells > the 2048 bucket floor, so compaction+chunks engage
    n = M ** 3
    rng = np.random.RandomState(9)
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4))
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-14, -9, n)),
        phihe0=jnp.asarray(10 ** rng.uniform(-15, -10, n)),
        phihe1=jnp.asarray(10 ** rng.uniform(-16, -11, n)),
        phiheat=jnp.asarray(10 ** rng.uniform(-32, -26, n)),
        photon_loss=jnp.zeros(()), lls_loss=jnp.zeros(()))
    dt = 1.0e13
    cfg = ChemistryConfig(cooling=setup_cooling_tables(),
                          isothermal=False, max_iter=21)
    s_host, c_host = global_chemistry_pass(cfg, state, rates, dt,
                                           host_loop=True)
    s_graph, c_graph = global_chemistry_pass(cfg, state, rates, dt,
                                             host_loop=False)
    assert int(c_host) == int(c_graph)
    for name in ("h_av1", "he_av2", "t_av", "t_inter"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_host, name)),
            np.asarray(getattr(s_graph, name)), rtol=1e-9,
            atol=1e-14, err_msg=name)


def test_dump_dir_with_iteration_fn_rejected(tmp_path):
    """dump_dir + caller-supplied iteration_fn used to IndexError at
    the first dump (the dump path reads out[4]); now a clear error."""
    from c2ray_tpu.sweep.evolve3d import evolve3d, make_evolve3d_iteration

    cfg, state = _heating_setup(M=12)
    it = make_evolve3d_iteration(cfg)
    with pytest.raises(ValueError, match="dump_dir"):
        evolve3d(cfg, state, jnp.zeros((1, 3), jnp.int32),
                 jnp.ones((1, 3)), 1e13, iteration_fn=it,
                 dump_dir=str(tmp_path))


def test_host_loop_isothermal():
    """An explicit host_loop=True with an isothermal config must work
    (the round-3 body hardcoded fixed_rates=None and would crash)."""
    from c2ray_tpu.sweep.global_pass import global_chemistry_pass
    from c2ray_tpu.sweep.source_sweep import RateGrids

    M = 6
    n = M ** 3
    rng = np.random.RandomState(6)
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4))
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-14, -9, n)),
        phihe0=jnp.asarray(10 ** rng.uniform(-15, -10, n)),
        phihe1=jnp.asarray(10 ** rng.uniform(-16, -11, n)),
        phiheat=jnp.zeros(n),
        photon_loss=jnp.zeros(()), lls_loss=jnp.zeros(()))
    dt = 1.0e13
    cfg = ChemistryConfig(cooling=None, isothermal=True,
                          isothermal_temperature=1.0e4)
    s_host, c_host = global_chemistry_pass(cfg, state, rates, dt,
                                           host_loop=True)
    s_graph, c_graph = global_chemistry_pass(cfg, state, rates, dt,
                                             host_loop=False)
    assert int(c_host) == int(c_graph)
    np.testing.assert_allclose(np.asarray(s_host.h_av1),
                               np.asarray(s_graph.h_av1),
                               rtol=1e-10, atol=1e-15)


def test_split_thermal_trip_bitequal():
    """The two-phase (split-thermal) host trip -- phase A capped
    lockstep, phase B compacted continuation, phase C finalize -- must
    be BIT-identical to the monolithic trip and the in-graph
    while_loop: a cell's sub-step sequence depends only on its own
    steps (global_pass._host_body_split)."""
    from c2ray_tpu.sweep.global_pass import global_chemistry_pass
    from c2ray_tpu.sweep.source_sweep import RateGrids

    M = 16
    n = M ** 3
    rng = np.random.RandomState(11)
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4))
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-14, -9, n)),
        phihe0=jnp.asarray(10 ** rng.uniform(-15, -10, n)),
        phihe1=jnp.asarray(10 ** rng.uniform(-16, -11, n)),
        phiheat=jnp.asarray(10 ** rng.uniform(-32, -24, n)),
        photon_loss=jnp.zeros(()), lls_loss=jnp.zeros(()))
    dt = 1.0e13
    cooling = setup_cooling_tables()
    cfg_mono = ChemistryConfig(cooling=cooling, isothermal=False,
                               thermal_chunk=0)
    cfg_split = ChemistryConfig(cooling=cooling, isothermal=False,
                                thermal_chunk=4)
    s_m, c_m = global_chemistry_pass(cfg_mono, state, rates, dt,
                                     host_loop=True)
    s_s, c_s = global_chemistry_pass(cfg_split, state, rates, dt,
                                     host_loop=True)
    s_g, c_g = global_chemistry_pass(cfg_mono, state, rates, dt,
                                     host_loop=False)
    assert int(c_m) == int(c_s) == int(c_g)
    for name in state._fields:
        a = np.asarray(getattr(s_m, name))
        # the split trip must be BIT-identical to the monolithic one
        assert np.array_equal(a, np.asarray(getattr(s_s, name))), name
        # vs the in-graph while_loop only allclose: differently-fused
        # compilations of the same body sit one FMA apart on occasional
        # cells (see test_host_body_cache_two_configs)
        np.testing.assert_allclose(a, np.asarray(getattr(s_g, name)),
                                   rtol=1e-6, atol=1e-12, err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_split_chem_full_grid_trips_keep_sharding():
    """Pod-readiness (VERDICT r4 #7): the host-driven chemistry trips
    must receive P(AXIS)-sharded full-grid inputs end-to-end -- an
    accidental replication here would silently run the chemistry
    redundantly on every pod device.  (Once the pass compacts below
    the full grid, the gathered bucket is intentionally replicated --
    the nonzero+gather all-gathers the mask; see
    global_pass._do_chemistry_global.)"""
    from jax.sharding import PartitionSpec as P

    import c2ray_tpu.sweep.global_pass as gp

    cfg, state = _heating_setup()
    M = cfg.sweep.mesh
    rng = np.random.RandomState(12)
    srcpos = rng.randint(0, M, (5, 3)).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, 5), np.zeros((5, 2))])
    dt = jnp.float64(4e13)
    state0 = begin_timestep(state)

    mesh_dev = Mesh(np.array(jax.devices()[:8]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)
    sp, nf = pad_sources(srcpos, nflux, 8)
    sp, nf = jnp.asarray(sp), jnp.asarray(nf)

    specs = []
    real = gp._host_body

    def spy(c, k=1):
        body = real(c, k)

        def wrapped(dt_, *rest):
            ndens, carry = rest[0], rest[-1]
            if ndens.size == M ** 3:  # full-grid trips only
                specs.append((ndens.sharding.spec,
                              carry[1].sharding.spec))
            return body(dt_, *rest)

        return wrapped

    gp._host_body = spy
    try:
        it_split = make_parallel_iteration(pcfg, split_chem=True)
        s_s, conv_s, _, _ = it_split(state0, sp, nf, dt)
    finally:
        gp._host_body = real
    assert specs, "no full-grid host trips recorded"
    for nd_spec, t_spec in specs:
        assert tuple(nd_spec) == ("d",), nd_spec
        assert tuple(t_spec) == ("d",), t_spec
    # and the pass's output state stays cell-sharded over all 8 devices
    assert len(s_s.h_av1.sharding.device_set) == 8


def test_damped_picard_paths_agree():
    """Damped Picard (DAMP_AFTER) must engage identically in the host
    loop and the in-graph while_loop: with max_iter past the damping
    threshold and stiff rates, both paths produce the same fields and
    identical convergence counts."""
    from c2ray_tpu.sweep.global_pass import (DAMP_AFTER,
                                             global_chemistry_pass)
    from c2ray_tpu.sweep.source_sweep import RateGrids

    M = 16
    n = M ** 3
    rng = np.random.RandomState(31)
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1.0e-4), 0.0, 0.0, 0.0, 1.0e4))
    # very hard rates so many cells iterate well past DAMP_AFTER
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-13, -8, n)),
        phihe0=jnp.asarray(10 ** rng.uniform(-14, -9, n)),
        phihe1=jnp.asarray(10 ** rng.uniform(-15, -10, n)),
        phiheat=jnp.asarray(10 ** rng.uniform(-30, -22, n)),
        photon_loss=jnp.zeros(()), lls_loss=jnp.zeros(()))
    dt = 1.0e14
    cfg = ChemistryConfig(cooling=setup_cooling_tables(),
                          isothermal=False,
                          max_iter=DAMP_AFTER + 30)
    s_host, c_host = global_chemistry_pass(cfg, state, rates, dt,
                                           host_loop=True)
    s_graph, c_graph = global_chemistry_pass(cfg, state, rates, dt,
                                             host_loop=False)
    assert int(c_host) == int(c_graph)
    for name in ("h_av1", "he_av2", "t_av", "t_inter"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_host, name)),
            np.asarray(getattr(s_graph, name)), rtol=1e-6,
            atol=1e-12, err_msg=name)
