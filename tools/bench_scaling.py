#!/usr/bin/env python
"""Source-parallel scaling benchmark on an N-device mesh.

Measures the sharded {sweep + psum + chemistry} iteration at 1..N
devices with proportional source counts (weak scaling over sources, the
reference's MPI scaling axis, SURVEY.md section 2.5).  On this
single-chip environment it runs on the virtual CPU mesh
(xla_force_host_platform_device_count), which validates the collective
path and measures parallel overhead; on a real pod slice the same code
measures ICI scaling.

Usage: python tools/bench_scaling.py [--mesh 32] [--devices 1 2 4 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=32)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--src-per-device", type=int, default=2)
    ap.add_argument("--mode", choices=["source", "domain"],
                    default="source")
    ap.add_argument("--heating", action="store_true",
                    help="non-isothermal: 47-band heating + split "
                         "host-driven chemistry (the round-4 "
                         "split_chem structure)")
    ap.add_argument("--radius", type=int, default=None,
                    help="domain-mode trace radius (default mesh/4)")
    ap.add_argument("--cpu", action="store_true", default=None)
    args = ap.parse_args()

    max_dev = max(args.devices)
    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={max_dev}")

    import jax

    if args.cpu or jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from c2ray_tpu import constants as const
    from c2ray_tpu.parallel import ParallelConfig, make_parallel_iteration, \
        pad_sources
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.radiation.quadrature import build_quadrature_tables
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep import SweepConfig, build_shell_table
    from c2ray_tpu.sweep.evolve3d import Evolve3DConfig
    from c2ray_tpu.sweep.global_pass import ChemistryConfig

    M = args.mesh
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    iso = not args.heating
    tables, sed, bands = build_quadrature_tables(
        SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e51)),
        isothermal=iso, dtype=dtype)
    if iso:
        chem = ChemistryConfig(cooling=None, isothermal=True,
                               isothermal_temperature=1e4)
    else:
        from c2ray_tpu.cooling import setup_cooling_tables
        chem = ChemistryConfig(cooling=setup_cooling_tables(dtype=dtype),
                               isothermal=False)
    cfg = Evolve3DConfig(
        sweep=SweepConfig(tables=tables, mesh=M, dr=50 * const.kpc / M,
                          isothermal=iso, flux_scale=bands.flux_scale),
        chem=chem,
        shells=build_shell_table(M))
    state = begin_timestep(initial_grid_state(
        np.full((M,) * 3, 1e-4), 0.0, 0.0, 0.0, 1e4, dtype=dtype))
    rng = np.random.RandomState(11)
    dt = jnp.asarray(1e14, dtype=dtype)

    from c2ray_tpu.parallel import (group_sources_by_slab,
                                    make_domain_iteration,
                                    max_domain_radius, shard_state_slabs)

    results = {}
    t1 = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            break
        n_src = args.src_per_device * nd
        srcpos = rng.randint(0, M, (n_src, 3)).astype(np.int32)
        nflux = np.column_stack([rng.uniform(0.5, 2.0, n_src),
                                 np.zeros((n_src, 2))])
        mesh_dev = Mesh(np.array(jax.devices()[:nd]), ("d",))
        pcfg = ParallelConfig(cfg=cfg, mesh=mesh_dev)

        # heating runs take the TPU-pod code path: sharded sweep +
        # host-driven split chemistry (split_chem; sharding.py:164-197)
        split = None if iso else True
        if args.mode == "domain":
            # grid-sharded mode: per-device memory M^3/nd; sources
            # grouped by owning slab (parallel/domain.py)
            radius = min(args.radius or M // 4, max_domain_radius(M))
            it = make_domain_iteration(pcfg, radius, split_chem=split)
            sp, nf = group_sources_by_slab(srcpos, nflux, M, nd)
            st = shard_state_slabs(state, mesh_dev)
        else:
            it = make_parallel_iteration(pcfg, split_chem=split)
            sp, nf = pad_sources(srcpos, nflux, nd)
            st = state
        sp, nf = jnp.asarray(sp), jnp.asarray(nf, dtype=dtype)
        out = it(st, sp, nf, dt)
        jax.block_until_ready(out[0].h_av1)
        t0 = time.perf_counter()
        out = it(st, sp, nf, dt)
        jax.block_until_ready(out[0].h_av1)
        el = time.perf_counter() - t0
        rate = M**3 * n_src / el
        if t1 is None:
            t1 = el
        eff = t1 / el  # weak scaling: ideal = const time
        results[nd] = dict(seconds=el, rate=rate, weak_efficiency=eff)
        print(f"# [{args.mode}] {nd} devices, {n_src} sources: {el:.3f}s "
              f"{rate:.3e} cell-src/s weak-eff {eff:.2f}",
              file=sys.stderr)

    best = max(results)
    phys = "heating" if args.heating else "isothermal"
    print(json.dumps({
        "metric": (f"weak_scaling_efficiency_{args.mode}_{phys}_"
                   f"{best}dev_mesh{M}"),
        "value": results[best]["weak_efficiency"],
        "unit": "fraction",
        "vs_baseline": 1.0,
        "detail": {str(k): v for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
