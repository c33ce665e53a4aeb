"""The XLA:TPU nested-loop kernel-fault bisect: ladder summary + probes.

Round 2's heating bench died with a TPU device kernel fault.  Round 3
isolated it with a six-stage on-chip bisect (this file consolidates the
six one-off stage scripts; their conclusions are encoded in the
shipping code at cooling.py:120-163 and global_pass.py host_loop).

THE LADDER (each stage ran on the real chip at 64^3-128^3 f32):

  stage 1 (chemistry-loop variants): the in-graph outer while_loop
    faults with the full body; passes with thermal() skipped
    ('nothermal') and with doric replaced by a trivial update
    ('nodoric'); still faults with rate_coefficients hoisted and with
    thermal capped at 8 sub-steps.  => the fault needs BOTH doric and
    thermal in one while body; neither alone.
  stage 2 (thermal internals): jit(thermal) alone at 64^3 passes; a
    trivial 1-trip outer loop around thermal passes; the
    chemistry-shaped outer loop with doric skipped passes; replacing
    coolin()'s table lookup with a constant makes the FULL body pass.
    => the cooling-table gather inside the doubly-nested loop is one
    ingredient.
  stage 3 (structural workarounds on the full body): nocool passes;
    jax.checkpoint around thermal or doric still faults; thermal's
    inner while -> masked 8-step scan still faults; an
    optimization_barrier between doric and thermal still faults.
    => no in-graph restructuring of the outer loop survives.
  stage 4 (gather restructurings, monkeypatching coolin): a single
    stacked (801,5)-table gather still faults (and lowers to a ~3.6x
    slower serialized loop); gather with explicit clip semantics
    faults; the two-hot (cells,801)@(801,5) MXU matmul interpolation
    PASSES and is fast.  => SHIPPED as cooling.py:120-163.
  stage 5 (bench-shape halves): with the MXU coolin, the heating sweep
    alone runs (50M cell-src-updates/s at 128^3x8); the chemistry pass
    alone STILL faults at >= 64^3 with cap 10000 (passes only with the
    outer loop unrolled to <= 8 trips).  => the remaining fault is the
    outer-while x thermal-while nesting itself.
  stage 6 (shippable workarounds): 8 masked thermal sub-steps per
    while iteration (fatter body, fewer trips) faults; disabling XLA
    while-loop double-buffering faults; dispatching the outer loop
    from the HOST (jitted body holds only thermal's single while)
    PASSES, 52 ms/trip steady at 64^3.  => SHIPPED as
    global_pass.py _do_chemistry_global(host_loop=True), auto-enabled
    on TPU heating runs and used by the split-chem parallel paths.

Remaining probes (re-runnable):

  python tools/fault_bisect.py repro [mesh]   # in-graph pass: expect
                                              # DEVICE FAULT on TPU
  python tools/fault_bisect.py fixed [mesh]   # host-loop pass: expect
                                              # PASS (the shipped path)
  python tools/fault_bisect.py gather [mesh]  # coolin A/B: MXU matmul
                                              # vs gather inside the
                                              # fused loop
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _problem(mesh):
    from c2ray_tpu.cooling import setup_cooling_tables
    from c2ray_tpu.state import begin_timestep, initial_grid_state
    from c2ray_tpu.sweep.global_pass import ChemistryConfig
    from c2ray_tpu.sweep.source_sweep import RateGrids

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    n = mesh ** 3
    rng = np.random.RandomState(7)
    state = begin_timestep(initial_grid_state(
        np.full((mesh,) * 3, 1e-4), 0., 0., 0., 1e2, dtype=dtype))
    rates = RateGrids(
        phih=jnp.asarray(10 ** rng.uniform(-14, -9, n), dtype),
        phihe0=jnp.asarray(10 ** rng.uniform(-15, -10, n), dtype),
        phihe1=jnp.asarray(10 ** rng.uniform(-16, -11, n), dtype),
        phiheat=jnp.asarray(10 ** rng.uniform(-32, -26, n), dtype),
        photon_loss=jnp.zeros((), dtype),
        lls_loss=jnp.zeros((), dtype))
    cfg = ChemistryConfig(cooling=setup_cooling_tables(dtype=dtype),
                          isothermal=False)
    return cfg, state, rates, jnp.asarray(1e13, dtype)


def probe(variant, mesh):
    from c2ray_tpu.sweep.global_pass import global_chemistry_pass

    cfg, state, rates, dt = _problem(mesh)
    host = variant == "fixed"
    t0 = time.time()
    s, conv = global_chemistry_pass(cfg, state, rates, dt,
                                    host_loop=host)
    jax.block_until_ready(s.t_av)
    print(f"{variant} mesh={mesh} OK "
          f"compile+run {time.time() - t0:.1f}s conv={int(conv)}")
    t0 = time.time()
    s, conv = global_chemistry_pass(cfg, state, rates, dt,
                                    host_loop=host)
    jax.block_until_ready(s.t_av)
    print(f"{variant} steady {time.time() - t0:.2f}s")


def probe_gather(mesh):
    """A/B the two coolin interpolation paths inside a thermal call
    (stage-4's surviving comparison)."""
    from c2ray_tpu import thermal as thermal_mod
    from c2ray_tpu.chemistry import electrondens

    cfg, state, rates, dt = _problem(mesh)
    ion = state.ion_state()
    de = electrondens(state.ndens, ion.avg)

    for use_matmul in (True, False):
        import functools

        from c2ray_tpu import cooling as cooling_mod

        coolfn = functools.partial(cooling_mod.coolin,
                                   use_matmul=use_matmul)
        f = jax.jit(lambda t0: thermal_mod.thermal(
            dt, t0, de, state.ndens, ion, rates.phiheat, cfg.cooling,
            0.0))
        try:
            t0 = time.time()
            r = f(state.t_final)
            jax.block_until_ready(r.end_temper)
            el = time.time() - t0
            t0 = time.time()
            r = f(state.t_final)
            jax.block_until_ready(r.end_temper)
            print(f"gather matmul={use_matmul} mesh={mesh} OK "
                  f"compile {el:.1f}s steady {time.time() - t0:.2f}s")
        except Exception as e:  # pragma: no cover - device fault path
            print(f"gather matmul={use_matmul} mesh={mesh} "
                  f"FAULT: {type(e).__name__}")


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 else "fixed"
    mesh = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if variant == "gather":
        probe_gather(mesh)
    else:
        probe(variant, mesh)
