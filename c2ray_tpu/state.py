"""3D grid state: densities, ionization fractions, temperatures.

The TPU equivalent of the reference's module-level state arrays
(``code/files_for_3D/mat_ini_test.F90:171-203`` for ndens/xh/xhe/
temperature_grid and ``code/files_for_3D/evolve_data.F90:40-97`` for the
iteration work arrays).  Everything lives in one immutable pytree of
flattened (mesh^3,) device arrays; functional updates replace the
reference's in-place mutation.

Temperature slots follow mat_ini_test.F90:469-515:
t_inter (slot 0, latest iterate), t_av (slot 1, time-averaged),
t_final (slot 2, start-of-timestep / converged value).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .chemistry import IonFractions, IonState


def canonical_dtype(dtype):
    """Resolve a requested dtype against the x64 mode *silently*.

    Constructing f64 arrays with x64 disabled floods logs with
    truncation warnings and hides real silent-truncation bugs; resolve
    once at state construction instead."""
    return jax.dtypes.canonicalize_dtype(jnp.dtype(dtype))


class GridState(NamedTuple):
    """All per-cell state, flattened to (mesh^3,)."""

    ndens: jnp.ndarray
    # start-of-timestep fractions (the reference's xh / xhe)
    h0: jnp.ndarray
    h1: jnp.ndarray
    he0: jnp.ndarray
    he1: jnp.ndarray
    he2: jnp.ndarray
    # time-averaged fractions (xh_av / xhe_av)
    h_av0: jnp.ndarray
    h_av1: jnp.ndarray
    he_av0: jnp.ndarray
    he_av1: jnp.ndarray
    he_av2: jnp.ndarray
    # intermediate (current iterate) fractions (xh_intermed / xhe_intermed)
    h_int0: jnp.ndarray
    h_int1: jnp.ndarray
    he_int0: jnp.ndarray
    he_int1: jnp.ndarray
    he_int2: jnp.ndarray
    # temperatures
    t_inter: jnp.ndarray
    t_av: jnp.ndarray
    t_final: jnp.ndarray
    # position-dependent clumping (scalar broadcastable or (mesh^3,))
    clumping: jnp.ndarray

    @property
    def mesh3(self) -> int:
        return self.ndens.shape[0]

    def ion_state(self, epsilon=1.0e-20) -> IonState:
        """IonState view with the reference's max(eps, .) clamps
        (evolve_point.F90:368-378)."""
        c = lambda x: jnp.maximum(x, epsilon)
        return IonState(
            cur=IonFractions(c(self.h_int0), c(self.h_int1), c(self.he_int0),
                             c(self.he_int1), c(self.he_int2)),
            avg=IonFractions(c(self.h_av0), c(self.h_av1), c(self.he_av0),
                             c(self.he_av1), c(self.he_av2)),
            old=IonFractions(c(self.h0), c(self.h1), c(self.he0),
                             c(self.he1), c(self.he2)),
        )


def initial_grid_state(ndens, xh1, xhe1, xhe2, temperature, clumping=1.0,
                       dtype=jnp.float64) -> GridState:
    """Build a GridState from physical fields (any shape; flattened)."""
    dtype = canonical_dtype(dtype)
    f = lambda a: jnp.asarray(a, dtype=dtype).reshape(-1)
    nd = f(ndens)
    n = nd.shape[0]
    b = lambda a: jnp.broadcast_to(jnp.asarray(a, dtype=dtype).reshape(-1),
                                   (n,)) if jnp.ndim(jnp.asarray(a)) == 0 \
        else f(a)
    h1 = b(xh1)
    he1 = b(xhe1)
    he2 = b(xhe2)
    t = b(temperature)
    h0 = 1.0 - h1
    he0 = 1.0 - he1 - he2
    cl = jnp.asarray(clumping, dtype=dtype)
    if cl.ndim > 0:
        cl = cl.reshape(-1)
    return GridState(
        ndens=nd,
        h0=h0, h1=h1, he0=he0, he1=he1, he2=he2,
        h_av0=h0, h_av1=h1, he_av0=he0, he_av1=he1, he_av2=he2,
        h_int0=h0, h_int1=h1, he_int0=he0, he_int1=he1, he_int2=he2,
        t_inter=t, t_av=t, t_final=t,
        clumping=cl,
    )


def begin_timestep(state: GridState) -> GridState:
    """Initialize av/intermed to the start-of-step values
    (evolve.F90:130-141)."""
    return state._replace(
        h_av0=state.h0, h_av1=state.h1,
        he_av0=state.he0, he_av1=state.he1, he_av2=state.he2,
        h_int0=state.h0, h_int1=state.h1,
        he_int0=state.he0, he_int1=state.he1, he_int2=state.he2,
    )


def finish_timestep(state: GridState) -> GridState:
    """On convergence, promote intermed -> committed and the final
    temperature (evolve.F90:163-166, set_final_temperature_point)."""
    return state._replace(
        h0=state.h_int0, h1=state.h_int1,
        he0=state.he_int0, he1=state.he_int1, he2=state.he_int2,
        t_final=state.t_inter,
    )
