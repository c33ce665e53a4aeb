"""Drive the PUBLIC driver API (Run3D) end-to-end on the chip.

Round-5 note: the criteria are calibrated against a CPU f64 ground
truth of the same config (an interior I-front, ionized volume 0.241);
the round-4 criteria at 600x the flux encoded an f32 artifact (f64
ionizes that whole box via the optically-thin hard bands).

The on-chip physics checks (tpu_stromgren_check, tpu_heating_check)
drive evolve3d directly; this one runs the full L10 driver -- config
dataclass, cosmological redshift-slice loop with traced comoving
rescaling, non-isothermal chemistry (the TPU host-loop structure), and
the output streams -- the exact entry point a reference user would
switch to (C2Ray.F90:103-405 analog).

Modes: single-chip, and (with one device) the domain-decomposed
shard_map path on real TPU hardware.

Usage: python tools/tpu_run3d_check.py [mesh]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(mesh=32, parallel=None):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import tempfile

    from c2ray_tpu.driver import Run3D, Run3DConfig
    from c2ray_tpu.nbody import test_nbody
    from c2ray_tpu.radiation import BlackBodySED, SEDConfig
    from c2ray_tpu.sources import SourceList

    tmp = tempfile.mkdtemp(prefix="run3d_check_")
    cfg = Run3DConfig(
        mesh=mesh, nbody=test_nbody(),
        sed=SEDConfig(bb=BlackBodySED(T_eff=5e4, S_star=3e49)),
        isothermal=False, initial_temperature=1.0e2,
        steps_per_slice=2, results_dir=tmp + "/results/",
        dump_dir=tmp + "/", parallel=parallel,
        n_devices=1 if parallel else None)
    run3d = Run3D(cfg)
    run3d.init_uniform_material()
    c = mesh // 2
    # NormFlux is a runtime array (no recompile): 2e8 x the 3e49/s
    # nominal = 6e57 photons/s, enough to drive the front a couple of
    # cells into the z~9 cosmological density of the 10 Mpc/h test box
    # (the reference's canned test source is 1e57/s at cell 50^3,
    # inputs/test_sources_onesrc.dat)
    # NormFlux calibrated against the CPU f64 ground truth (round 5):
    # 3e5 x the 3e49/s nominal = 9e54 photons/s puts the I-front ~12
    # cells from the center source (ionized volume fraction 0.241,
    # corner xh1 ~ 8e-17, corner T 98 K, center T 15063 K).  The
    # round-4 check used 2e8, where f64 shows the hard bands ionize
    # the ENTIRE box (corner xh1 = 1.0) -- the old corner<0.1
    # criterion had encoded an f32 artifact that trapped photons.
    srcs = SourceList(
        srcpos=np.array([[c, c, c], [c // 2, c, c]], dtype=np.int32),
        nflux=np.array([[3.0e5, 0.0, 0.0], [1.5e5, 0.0, 0.0]]))

    t0 = time.perf_counter()
    run3d.run_slice(0, srcs)
    wall = time.perf_counter() - t0

    xh1 = np.asarray(run3d.state.h1).reshape(mesh, mesh, mesh)
    T = np.asarray(run3d.state.t_final).reshape(mesh, mesh, mesh)
    outs = sorted(os.listdir(tmp + "/results"))
    mode = parallel or "single"
    print(f"[{mode}] backend={jax.default_backend()} mesh={mesh} "
          f"slice wall={wall:.1f}s")
    print(f"[{mode}] xh1 center={xh1[c, c, c]:.4f} "
          f"corner={xh1[0, 0, 0]:.2e}; T center={T[c, c, c]:.0f} K "
          f"corner={T[0, 0, 0]:.0f} K")
    print(f"[{mode}] outputs: {outs[:6]}")
    ion_frac = float((xh1 > 0.5).mean())
    print(f"[{mode}] ionized volume fraction {ion_frac:.3f} "
          f"(f64 truth 0.241)")
    ok = (xh1[c, c, c] > 0.8 and xh1[0, 0, 0] < 0.1
          and 5.0e3 < T[c, c, c] < 6.0e4 and T[0, 0, 0] < 1.0e3
          and 0.15 < ion_frac < 0.35
          and np.all(np.isfinite(T)) and len(outs) >= 2)
    print(f"[{mode}]", "PASS" if ok else "FAIL")
    return ok, xh1, T


def main(argv):
    mesh = int(argv[0]) if argv else 32
    ok1, xh_s, t_s = run(mesh)
    ok2, xh_d, t_d = run(mesh, parallel="domain")
    # the two execution modes must agree on the physics (f32 envelope)
    dx = float(np.max(np.abs(xh_s - xh_d)))
    dt_rel = float(np.max(np.abs(t_s - t_d) / t_s))
    print(f"single-vs-domain: max |dxh1|={dx:.2e}, "
          f"max relative dT={dt_rel:.2e}")
    agree = dx < 1e-3 and dt_rel < 1e-2
    print("PASS" if (ok1 and ok2 and agree) else "FAIL")
    return 0 if (ok1 and ok2 and agree) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
