"""Human-readable formatters for the report stage — the analogue of
``readableDuration`` / ``readableFileSize`` / ``readableBitRate``
(``comparison.cpp:229-264``).  Report-stage only; never in hot paths."""

from __future__ import annotations


def readable_bytes(n: int) -> str:
    """Mirrors readableFileSize (comparison.cpp:236-245): KB/MB/GB with one
    decimal above KB."""
    n = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if abs(n) < 1024.0 or unit == "PB":
            if unit == "B":
                return f"{int(n)} B"
            return f"{n:.1f} {unit}"
        n /= 1024.0
    return f"{n:.1f} PB"


def readable_count(n: int) -> str:
    if n < 1000:
        return str(n)
    for unit in ("k", "M", "B"):
        n /= 1000.0
        if abs(n) < 1000 or unit == "B":
            return f"{n:.1f}{unit}"
    return f"{n:.1f}B"


def readable_duration(seconds: float) -> str:
    """Mirrors msToHHMMSS (video.cpp:243-263): H:MM:SS.mmm."""
    ms = int(round(seconds * 1000))
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h}:{m:02d}:{s:02d}.{milli:03d}"
