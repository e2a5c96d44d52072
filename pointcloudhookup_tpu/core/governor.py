"""Resource governor: RAM/HBM-aware auto-sizing of chunk capacities.

The reference sizes work to the machine instead of OOMing on big tiles:
chunk_size picked from available RAM (500k/1M/2M points for 4/8/16 GB,
/root/reference/ui/Sampling.py:88-89) and processing capped to a
max-memory percentage with a hard point ceiling
(/root/reference/test/008.py:109,231-243).

The TPU-native equivalents sized here:

  host  — the streaming staging cost per point (f64 decode copy + f32
          padded upload buffer + mask, ~44 B live per point per
          prefetch slot, x prefetch depth);
  device— the fused extract footprint per point (Morton keys, sort
          double-buffers, payload columns, segmented-scan temporaries;
          ~140 B/pt measured envelope at 4M on v5e), against the chip's
          HBM minus a safety fraction.

Capacities snap DOWN onto a power-of-two ladder so repeated runs reuse
jit caches instead of recompiling per file size.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Optional

# bytes per point, measured envelopes (see module docstring)
HOST_BYTES_PER_POINT = 44
DEVICE_BYTES_PER_POINT = 140

# HBM per chip when the runtime can't report it (axon tunnels return no
# memory_stats): v5e/lite = 16 GiB, v4 = 32 GiB; default conservative.
_HBM_BY_KIND = {
    "lite": 16 << 30,  # v5 lite (v5e)
    "v5": 16 << 30,
    "v4": 32 << 30,
    "v6": 32 << 30,
    "cpu": 8 << 30,
}
_DEFAULT_HBM = 16 << 30

_LADDER = [1 << s for s in range(14, 27)]  # 16k .. 64M points


@dataclasses.dataclass
class ResourceBudget:
    host_available: int  # bytes
    device_budget: int  # bytes (HBM or fallback estimate)
    capacity: int  # points per device chunk
    chunk_size: int  # points per host processing chunk
    reason: str


def host_available_bytes() -> int:
    """MemAvailable from /proc/meminfo (psutil fallback)."""
    try:
        with open("/proc/meminfo") as f:
            m = re.search(r"MemAvailable:\s+(\d+) kB", f.read())
        if m:
            return int(m.group(1)) * 1024
    except OSError:
        pass
    try:
        import psutil

        return int(psutil.virtual_memory().available)
    except Exception:
        return 4 << 30  # the reference's smallest RAM class


def device_memory_bytes(device=None) -> int:
    """Usable accelerator memory; falls back to a per-kind table when the
    runtime gives no stats (remote tunnels)."""
    if device is None:
        try:
            import jax

            device = jax.devices()[0]
        except Exception:
            return _DEFAULT_HBM
    try:
        stats = device.memory_stats()
        if stats:
            lim = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
            if lim:
                return int(lim)
    except Exception:
        pass
    kind = getattr(device, "device_kind", "") or ""
    kind = kind.lower()
    for key, size in _HBM_BY_KIND.items():
        if key in kind:
            return size
    return _DEFAULT_HBM


def _snap_down(n: int) -> int:
    best = _LADDER[0]
    for v in _LADDER:
        if v <= n:
            best = v
    return best


def auto_capacity(
    *,
    device=None,
    max_memory_percent: float = 30.0,
    device_memory_fraction: float = 0.6,
    prefetch: int = 1,
    hard_cap: Optional[int] = None,
    n_points: Optional[int] = None,
) -> int:
    """Points per device chunk sized to BOTH host staging RAM and HBM.

    max_memory_percent mirrors test/008.py:109 (default 30% of available
    host RAM may hold staging buffers); device_memory_fraction leaves
    headroom for XLA temporaries beyond the measured per-point envelope.
    hard_cap is the explicit override (the reference's ≤2M cap analogue);
    n_points, when known, avoids over-allocating for small inputs.
    """
    host_budget = int(host_available_bytes() * max_memory_percent / 100.0)
    host_cap = host_budget // (HOST_BYTES_PER_POINT * max(prefetch + 1, 2))
    dev_budget = int(device_memory_bytes(device) * device_memory_fraction)
    dev_cap = dev_budget // DEVICE_BYTES_PER_POINT
    cap = min(host_cap, dev_cap)
    if hard_cap is not None:
        cap = min(cap, hard_cap)
    cap = max(cap, _LADDER[0])
    cap = _snap_down(cap)
    if n_points is not None and n_points > 0:
        # smallest ladder rung that holds the whole input in one chunk,
        # but never beyond the memory-derived cap
        for v in _LADDER:
            if v >= n_points:
                return min(v, cap)
    return cap


def auto_chunk_size(*, max_memory_percent: float = 30.0) -> int:
    """Host-side processing chunk following the reference's RAM ladder
    (ui/Sampling.py:88-89: 500k/1M/2M points for 4/8/16 GB), scaled by
    the same available-memory budget as auto_capacity."""
    avail_gb = host_available_bytes() / (1 << 30)
    if avail_gb >= 16:
        base = 2_000_000
    elif avail_gb >= 8:
        base = 1_000_000
    else:
        base = 500_000
    # very large hosts scale past the reference's table linearly, capped
    # at 16M points per chunk to bound single-chunk latency
    if avail_gb > 32:
        base = min(int(base * avail_gb / 16.0), 16_000_000)
    return int(base * min(max_memory_percent, 100.0) / 30.0)


def budget(
    *,
    device=None,
    max_memory_percent: float = 30.0,
    prefetch: int = 1,
    hard_cap: Optional[int] = None,
    n_points: Optional[int] = None,
) -> ResourceBudget:
    host = host_available_bytes()
    dev = device_memory_bytes(device)
    cap = auto_capacity(
        device=device,
        max_memory_percent=max_memory_percent,
        prefetch=prefetch,
        hard_cap=hard_cap,
        n_points=n_points,
    )
    chunk = auto_chunk_size(max_memory_percent=max_memory_percent)
    return ResourceBudget(
        host_available=host,
        device_budget=dev,
        capacity=cap,
        chunk_size=chunk,
        reason=(
            f"host {host / (1 << 30):.1f} GiB avail @ {max_memory_percent:.0f}%"
            f", device {dev / (1 << 30):.1f} GiB -> capacity {cap:,}"
            f", chunk {chunk:,}"
        ),
    )


def estimate_points(las_path: str) -> Optional[int]:
    """Cheap point-count probe from the LAS header (no full decode)."""
    try:
        from pointcloudhookup_tpu.io.las import peek_point_count

        return peek_point_count(las_path)
    except Exception:
        try:
            return max(os.path.getsize(las_path) // 28, 1)
        except OSError:
            return None
