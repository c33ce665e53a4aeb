from .geometry import ShellTable, build_shell_table
from .cinterp import cinterp_shell
from .source_sweep import SweepConfig, sweep_sources_accumulate
from .global_pass import global_chemistry_pass
from .evolve3d import Evolve3DConfig, evolve3d

__all__ = [
    "ShellTable", "build_shell_table", "cinterp_shell",
    "SweepConfig", "sweep_sources_accumulate",
    "global_chemistry_pass", "Evolve3DConfig", "evolve3d",
]
