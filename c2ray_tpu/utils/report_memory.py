"""Host + device memory reporting.

Re-implementation of ``code/report_memory.f90:52-117`` (parse
/proc/self/status for VmPeak/VmSize/VmRSS/VmHWM per timestep), extended
with device (HBM) statistics from the JAX runtime.
"""

from typing import Dict, Optional


_KEYS = ("VmPeak", "VmSize", "VmRSS", "VmHWM")


def host_memory_kb() -> Dict[str, int]:
    """Parse /proc/self/status (report_memory.f90:52-117)."""
    out = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                key = line.split(":")[0]
                if key in _KEYS:
                    out[key] = int(line.split()[1])
    except OSError:
        pass
    return out


def device_memory_bytes() -> Dict[str, int]:
    """Per-device HBM usage from the JAX runtime (TPU extension)."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
            }
    return out


def memory_report(logf=None) -> str:
    """One formatted line per call (the reference writes this each
    timestep, C2Ray.F90:312)."""
    host = host_memory_kb()
    parts = [f"{k}={v//1024}MB" for k, v in host.items()]
    dev = device_memory_bytes()
    for name, s in dev.items():
        parts.append(
            f"{name}: {s['bytes_in_use']/2**30:.2f}/"
            f"{s['bytes_limit']/2**30:.2f}GB "
            f"(peak {s['peak_bytes_in_use']/2**30:.2f}GB)")
    line = "memory: " + " ".join(parts)
    if logf is not None:
        print(line, file=logf)
    return line
