#!/usr/bin/env python
"""Dump the radiation tables for inspection / regression.

Re-implementation of the standalone ``code/files_for_1D/TableWrite.F90``
program: run the radiation initialisation, then write the photo/heating
thick+thin tables to binary files for external comparison
(TableWrite.F90:126-144).

Usage: python tools/table_write.py [outdir] [--teff 5e4] [--sstar 1e48]
       [--quadrature] [--isothermal]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="./tables_out")
    ap.add_argument("--teff", type=float, default=5.0e4)
    ap.add_argument("--sstar", type=float, default=1.0e48)
    ap.add_argument("--isothermal", action="store_true")
    ap.add_argument("--quadrature", action="store_true",
                    help="dump the quadrature node data instead of "
                    "the tau tables")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from c2ray_tpu.radiation import BlackBodySED, SEDConfig

    os.makedirs(args.outdir, exist_ok=True)
    sed = SEDConfig(bb=BlackBodySED(T_eff=args.teff, S_star=args.sstar))

    if args.quadrature:
        from c2ray_tpu.radiation.quadrature import build_quadrature_tables

        # the dump format is the dense (nband, K) layout: request a
        # fixed rule (the "auto" default returns uniform-K blocks)
        qt, sed_n, bands = build_quadrature_tables(
            sed, isothermal=args.isothermal, n_nodes=8)
        np.savez(os.path.join(args.outdir, "bb_quadrature.npz"),
                 sigma_hat=np.asarray(qt.bb.sigma_hat),
                 A_photo=np.asarray(qt.bb.A_photo),
                 **({} if args.isothermal else {
                     "A_heat_HI": np.asarray(qt.bb.A_heat_HI),
                     "A_heat_HeI": np.asarray(qt.bb.A_heat_HeI),
                     "A_heat_HeII": np.asarray(qt.bb.A_heat_HeII)}))
        print(f"wrote quadrature data to {args.outdir}")
        return

    from c2ray_tpu.io import write_unformatted_cube
    from c2ray_tpu.io.fortran_records import write_fortran_record
    from c2ray_tpu.radiation import build_radiation_tables

    tables, sed_n, bands = build_radiation_tables(
        sed, isothermal=args.isothermal)

    # same file set as TableWrite.F90:126-144
    names = {"bb_photo_thick_table.bin": tables.bb.photo_thick,
             "bb_photo_thin_table.bin": tables.bb.photo_thin}
    if not args.isothermal:
        names["bb_heat_thick_table.bin"] = tables.bb.heat_thick
        names["bb_heat_thin_table.bin"] = tables.bb.heat_thin
    for name, tab in names.items():
        with open(os.path.join(args.outdir, name), "wb") as f:
            write_fortran_record(f, np.asarray(tab, dtype=np.float64))
    print(f"wrote {len(names)} tables to {args.outdir} "
          f"(S_star={sed_n.bb.S_star:.4e})")


if __name__ == "__main__":
    main()
