"""Run reporting utilities (reference console/report analogs, SURVEY §2.2 M8)."""

from __future__ import annotations


def format_duration(seconds: float) -> str:
    """Human-readable elapsed time — s / m / h tiers like the reference's
    formatter (/root/reference/src/main.rs:26-35)."""
    if seconds < 60:
        return f"{seconds:.2f}s"
    if seconds < 3600:
        m, s = divmod(seconds, 60)
        return f"{int(m)}m {s:.0f}s"
    h, rem = divmod(seconds, 3600)
    m = rem // 60
    return f"{int(h)}h {int(m)}m"
