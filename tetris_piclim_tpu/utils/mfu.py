"""Model-FLOPs-utilization (MFU) accounting.

The reference has no performance accounting at all (SURVEY.md §5.1: ad-hoc
cProfile blocks). For a TPU framework the honest utilization number is
MFU = (FLOPs the program actually encodes) / (elapsed x chip peak FLOP/s),
with FLOPs taken from XLA's own cost model of the COMPILED executable
(``compiled.cost_analysis()["flops"]``) — not from a hand-derived formula
that drifts from the code.

Peak numbers are dense-matmul bf16 peaks per chip from public TPU specs;
MFU reported against bf16 peak is the standard convention even for f32
programs (it answers "how much of the chip's money rate are we getting").
"""

from __future__ import annotations

from typing import Optional

import jax

# dense bf16 matmul peak FLOP/s per chip (public spec sheets)
_PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12,   # v5e device_kind is "TPU v5 lite"
    "v5e": 197e12,
    "v5p": 459e12,
    "v5": 459e12,
    "v6 lite": 918e12,   # v6e / Trillium
    "v6e": 918e12,
}


def peak_flops(device: Optional[jax.Device] = None) -> Optional[float]:
    """bf16 peak FLOP/s for ``device`` (default: first device), or None if
    the device kind is not a known TPU (e.g. the CPU test backend)."""
    device = device if device is not None else jax.devices()[0]
    kind = device.device_kind.lower()
    # match the most specific key first ("v5 lite" before "v5")
    for k in sorted(_PEAK_BF16, key=len, reverse=True):
        if k in kind:
            return _PEAK_BF16[k]
    return None


def compiled_flops(compiled) -> Optional[float]:
    """FLOPs encoded in a compiled executable, from XLA's cost analysis.
    Handles both the dict and the list-of-dict return conventions."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = ca.get("flops") if hasattr(ca, "get") else None
    if flops is None or flops <= 0:
        return None
    return float(flops)


def mfu_from_flops(flops: float, elapsed_s: float,
                   device: Optional[jax.Device] = None) -> Optional[dict]:
    """MFU given a known FLOP count and elapsed seconds.

    CAVEAT on where ``flops`` must come from: XLA's cost analysis counts a
    while/scan body ONCE, not x trip-count (verified empirically — a
    10-iteration scanned matmul reports ~1 iteration of FLOPs). So take
    ``compiled_flops`` from UNLOOPED single-call programs and multiply by
    the known trip counts yourself; never trust cost_analysis of a scanned
    program directly."""
    device = device if device is not None else jax.devices()[0]
    p = peak_flops(device)
    if p is None or elapsed_s <= 0 or flops <= 0:
        return None
    return {
        "flops": float(flops),
        "peak_flops": p,
        "mfu": float(flops) / (elapsed_s * p),
        "device_kind": device.device_kind,
    }


def mfu(compiled, elapsed_s: float,
        device: Optional[jax.Device] = None) -> Optional[dict]:
    """MFU of one execution of ``compiled`` taking ``elapsed_s`` seconds.
    Only valid for programs WITHOUT internal loops (see mfu_from_flops)."""
    f = compiled_flops(compiled)
    if f is None:
        return None
    return mfu_from_flops(f, elapsed_s, device)
