"""Stage-4 bisect: coolin()'s table gathers are implicated (stage 3:
nocool passes, everything with the real 5-table gather faults).  Try
gather restructurings on the otherwise-unchanged full body by
monkeypatching c2ray_tpu.thermal.coolin, then running stage 3's
'fullref' chemistry loop:

  stacked   -- one gather on a (801, 5) stacked table
  sanitize  -- nan_to_num on the table position before the int cast
  clipget   -- tab.at[idx].get(mode='clip') explicit clip semantics
  onehot    -- interpolation as a (n, 801) @ (801, 5) matmul (MXU)
"""

import sys

sys.path.insert(0, ".")

WRAP = sys.argv[1] if len(sys.argv) > 1 else "stacked"
MESH = sys.argv[2] if len(sys.argv) > 2 else "64"

import jax
import jax.numpy as jnp

from c2ray_tpu import constants as const
from c2ray_tpu import thermal as thermal_mod
from c2ray_tpu.cooling import DTEMP_LOG, MINTEMP_LOG, TEMPPOINTS


def make_coolin(kind):
    def coolin2(tables, nucldens, eldens, xh0, xh1, xhe0, xhe1, xhe2,
                temperature):
        tab5 = jnp.stack([tables.h0, tables.h1, tables.he0, tables.he1,
                          tables.he2], axis=-1)        # (801, 5)
        tpos = (jnp.log10(temperature) - MINTEMP_LOG) / DTEMP_LOG
        if kind == "sanitize":
            tpos = jnp.nan_to_num(tpos, nan=0.0, posinf=TEMPPOINTS - 2.0,
                                  neginf=0.0)
        itpos = jnp.clip(tpos.astype(jnp.int32), 0, TEMPPOINTS - 2)
        dtpos = (tpos - itpos.astype(tpos.dtype))[..., None]
        if kind == "onehot":
            oh = jax.nn.one_hot(itpos, TEMPPOINTS, dtype=tpos.dtype)
            lo = oh @ tab5
            oh1 = jax.nn.one_hot(itpos + 1, TEMPPOINTS, dtype=tpos.dtype)
            hi = oh1 @ tab5
        elif kind == "clipget":
            lo = tab5.at[itpos].get(mode="clip")
            hi = tab5.at[itpos + 1].get(mode="clip")
        else:                                          # stacked / sanitize
            lo = tab5[itpos]
            hi = tab5[itpos + 1]
        lam = lo + (hi - lo) * dtpos                   # (n, 5)
        x5 = jnp.stack([xh0 * (1.0 - const.abu_he),
                        xh1 * (1.0 - const.abu_he),
                        xhe0 * const.abu_he, xhe1 * const.abu_he,
                        xhe2 * const.abu_he], axis=-1)
        return nucldens * eldens * jnp.sum(lam * x5, axis=-1)

    return coolin2


thermal_mod.coolin = make_coolin(WRAP)

sys.argv = ["fault_bisect3.py", "fullref", MESH]
sys.path.insert(0, "tools")
import fault_bisect3 as fb3

if __name__ == "__main__":
    print(f"coolin wrapper: {WRAP}")
    fb3.run()
