"""Measure what round 4 built (VERDICT r4 weak #4b/#4c).

(b) REAL per-device HBM across the domain-mode radius ladder, read
    from the TPU runtime (utils/report_memory.device_memory_bytes),
    vs the `domain_memory_elements` model that guards the adaptive
    ladder's memory cap (parallel/domain.py).  Runs on the one real
    chip (D=1); the model's D-scaling is separately covered by
    tests/test_domain_memory.py.

(c) The split-chem per-iteration resharding cost in the
    source-parallel heating path: the replicated sweep output and the
    ~20-field state are device_put re-sharded to P(d) every iteration
    (parallel/sharding.py:182-197), then the next sweep gathers the
    sharded state back through in_specs=P().  Measured on the virtual
    8-device CPU mesh (bytes moved are exact; seconds are CPU-mesh
    indicative, not ICI).

Usage:
  python tools/measure_memory_resharding.py hbm   [mesh]   # on TPU
  python tools/measure_memory_resharding.py reshard [mesh] # CPU mesh
Prints one JSON line each (tracked in BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def hbm_ladder(mesh=128):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from c2ray_tpu import constants as const
    from c2ray_tpu.cooling import setup_cooling_tables
    from c2ray_tpu.parallel import (ParallelConfig,
                                    group_sources_by_slab,
                                    make_domain_iteration,
                                    shard_state_slabs)
    from c2ray_tpu.parallel.domain import domain_memory_elements
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep import SweepConfig, build_shell_table
    from c2ray_tpu.sweep.evolve3d import Evolve3DConfig
    from c2ray_tpu.sweep.global_pass import ChemistryConfig
    from c2ray_tpu.utils.report_memory import device_memory_bytes

    dtype = (jnp.float32 if jax.default_backend() == "tpu"
             else jnp.float64)
    itemsize = np.dtype(dtype).itemsize
    M = mesh
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
        isothermal=True, dtype=dtype)
    cfg = Evolve3DConfig(
        sweep=SweepConfig(tables=tables, mesh=M, dr=50 * const.kpc / M,
                          isothermal=True, flux_scale=bands.flux_scale),
        chem=ChemistryConfig(cooling=None, isothermal=True,
                             isothermal_temperature=1e4),
        shells=build_shell_table(M))
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1e-4), 0.0, 0.0, 0.0, 1e4, dtype=dtype))
    rng = np.random.RandomState(5)
    srcpos = rng.randint(0, M, (4, 3)).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, 4),
                             np.zeros((4, 2))])
    dt = jnp.asarray(1e13, dtype=dtype)

    mesh_dev = Mesh(np.array(jax.devices()[:1]), ("d",))
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)
    sp, nf = group_sources_by_slab(srcpos, nflux, M, 1)
    sp, nf = jnp.asarray(sp), jnp.asarray(nf, dtype=dtype)
    st = shard_state_slabs(state, mesh_dev)

    rows = {}
    for radius in (8, 16, 32, M // 2):
        it = make_domain_iteration(pcfg, radius)
        out = it(st, sp, nf, dt)
        jax.block_until_ready(out[0].h_av1)
        stats = device_memory_bytes()
        peak = max((s["peak_bytes_in_use"] for s in stats.values()),
                   default=0)
        # the axon tunnel device returns memory_stats() = None, so
        # real HBM telemetry is unavailable here; the behavioral OOM
        # boundaries stand in as hardware evidence (256^3 vmapped-8
        # sweep OOMs at ~26 GB, source chunk 8 fails to compile,
        # chunk 4 fits -- tools/profile_256.py)
        model = domain_memory_elements(M, 1, radius) * itemsize
        rows[radius] = {
            "peak_hbm_bytes": int(peak),
            "model_bytes": int(model),
            "model_over_peak": round(model / peak, 3) if peak else None,
        }
        print(f"# radius {radius}: peak HBM {peak/2**30:.2f} GiB, "
              f"model {model/2**30:.2f} GiB", flush=True)
        del it, out

    print(json.dumps({"mode": "hbm_ladder", "mesh": M,
                      "backend": jax.default_backend(),
                      "note": ("peak_bytes_in_use is cumulative over "
                               "the process, so rows are only "
                               "comparable when the peak grows; the "
                               "model counts the iteration's live "
                               "arrays only"),
                      "rows": rows}), flush=True)


def reshard_cost(mesh=64):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from c2ray_tpu import constants as const
    from c2ray_tpu.cooling import setup_cooling_tables
    from c2ray_tpu.parallel import ParallelConfig, pad_sources
    from c2ray_tpu.parallel.sharding import make_parallel_iteration
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep import SweepConfig, build_shell_table
    from c2ray_tpu.sweep.evolve3d import Evolve3DConfig
    from c2ray_tpu.sweep.global_pass import ChemistryConfig

    M = mesh
    dtype = jnp.float64
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
        isothermal=False, dtype=dtype)
    cfg = Evolve3DConfig(
        sweep=SweepConfig(tables=tables, mesh=M, dr=50 * const.kpc / M,
                          isothermal=False,
                          flux_scale=bands.flux_scale),
        chem=ChemistryConfig(cooling=setup_cooling_tables(dtype=dtype),
                             isothermal=False),
        shells=build_shell_table(M))
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1e-4), 0.0, 0.0, 0.0, 1e4, dtype=dtype))
    rng = np.random.RandomState(5)
    srcpos = rng.randint(0, M, (8, 3)).astype(np.int32)
    nflux = np.column_stack([rng.uniform(0.5, 2.0, 8),
                             np.zeros((8, 2))])
    dt = jnp.asarray(1e13, dtype=dtype)

    mesh_dev = Mesh(np.array(jax.devices()[:8]), ("d",))
    cell_sharding = NamedSharding(mesh_dev, P("d"))

    # the exact re-shard the split path performs per iteration
    # (sharding.py:182-197): ~20 state fields + 4 rate grids
    n = M ** 3
    nfields = len(state._fields) + 4
    bytes_moved = nfields * n * np.dtype(dtype).itemsize

    scalar_sharding = NamedSharding(mesh_dev, P())

    def reshard(st):
        return jax.tree.map(
            lambda x: jax.device_put(
                x, cell_sharding if jnp.ndim(x) else scalar_sharding),
            st)

    st = state
    r = reshard(st)
    jax.block_until_ready(r.ndens)
    t0 = time.perf_counter()
    for _ in range(5):
        r = reshard(state)
        jax.block_until_ready(r.ndens)
    t_reshard = (time.perf_counter() - t0) / 5

    # a full split-chem iteration for scale
    pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)
    it = make_parallel_iteration(pcfg, split_chem=True)
    sp, nf = pad_sources(srcpos, nflux, 8)
    sp, nf = jnp.asarray(sp), jnp.asarray(nf, dtype=dtype)
    out = it(state, sp, nf, dt)
    jax.block_until_ready(out[0].h_av1)
    t0 = time.perf_counter()
    out = it(state, sp, nf, dt)
    jax.block_until_ready(out[0].h_av1)
    t_iter = time.perf_counter() - t0

    print(json.dumps({
        "mode": "reshard_cost", "mesh": M, "devices": 8,
        "backend": "cpu-virtual-mesh",
        "state_fields_resharded": nfields,
        "bytes_resharded_per_iteration": int(bytes_moved),
        "reshard_seconds": t_reshard,
        "split_iteration_seconds": t_iter,
        "reshard_fraction": round(t_reshard / t_iter, 4),
        "note": ("the split path re-shards the replicated sweep output "
                 "+ state to P(d) each iteration and the next sweep "
                 "all-gathers it back: O(mesh^3) traffic/iteration by "
                 "design, the allreduce-class volume the domain mode "
                 "avoids; seconds are virtual-CPU-mesh indicative, "
                 "bytes are exact")}), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "reshard"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else (128 if mode == "hbm"
                                                    else 64)
    if mode == "hbm":
        hbm_ladder(m)
    else:
        reshard_cost(m)
