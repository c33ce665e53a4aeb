"""Wall/CPU phase timers.

Re-implementation of ``code/clocks.f90``: accumulating CPU + wall-clock
counters with phase timestamps written to a `Timings.log`.  On TPU the
interesting addition is device-synchronised timing (`block_until_ready`
before stamping) and optional `jax.profiler` trace capture -- the modern
replacement for the reference's gprof workflow (SURVEY.md section 5).
"""

import os
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Clocks:
    """setup/update/report clocks (clocks.f90:59-147)."""

    log_path: Optional[str] = None
    _t0_wall: float = field(default_factory=time.time)
    _t0_cpu: float = field(default_factory=time.process_time)
    _last_wall: float = 0.0
    _last_cpu: float = 0.0

    def __post_init__(self):
        self._last_wall = self._t0_wall
        self._last_cpu = self._t0_cpu
        if self.log_path:
            os.makedirs(os.path.dirname(self.log_path) or ".",
                        exist_ok=True)
            with open(self.log_path, "a") as f:
                f.write(f"# clocks started {time.ctime()}\n")

    def timestamp_wallclock(self) -> float:
        """Seconds since setup (timestamp_wallclock, clocks.f90:142-147)."""
        return time.time() - self._t0_wall

    def update(self, label: str, sync=None):
        """Record a phase boundary; returns (d_wall, d_cpu) since the
        previous update (update_clocks + report pattern,
        clocks.f90:96-139).

        ``sync``: optional jax array to block_until_ready before
        stamping, so device work is attributed to the right phase.
        """
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        now_w, now_c = time.time(), time.process_time()
        dw, dc = now_w - self._last_wall, now_c - self._last_cpu
        self._last_wall, self._last_cpu = now_w, now_c
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(f"{self.timestamp_wallclock():10.2f} {label}: "
                        f"wall={dw:.3f}s cpu={dc:.3f}s\n")
        return dw, dc

    def report(self):
        """Total accounting (report_clocks, clocks.f90:120-139)."""
        wall = time.time() - self._t0_wall
        cpu = time.process_time() - self._t0_cpu
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(f"# total wall={wall:.2f}s cpu={cpu:.2f}s\n")
        return wall, cpu


def start_device_trace(logdir: str):
    """Begin a jax profiler trace (the TPU-native tracing subsystem the
    reference lacks -- SURVEY.md section 5 'Tracing')."""
    import jax

    jax.profiler.start_trace(logdir)


def stop_device_trace():
    import jax

    jax.profiler.stop_trace()
