"""c2ray_tpu: TPU-native photon-conserving radiative transfer (C2-Ray class).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
garrelt/C2-Ray3Dm1D_Helium: multi-frequency H+He photo-ionization and
thermal evolution with short-characteristics ray tracing, in 1D
(spherical test problems) and 3D (multi-source cosmological
reionization), SPMD-parallel over device meshes.
"""

__version__ = "0.1.0"
