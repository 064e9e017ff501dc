"""float32 threshold arithmetic matching the reference bit-for-bit.

The reference evaluates the match-ratio predicate in 32-bit floats
(reference: src/utils.rs:6-8):

    (n_decoded as f32) / (n_decoded as f32 + n_skips as f32) >= threshold

so boundary thresholds like 2/3 must be compared after f32 rounding, not in
Python's f64 (pinned by the README 2/3-threshold golden,
reference: README.rst:18-59).

Implementation note: we compute the quotient in f64 and round once to f32.
For quotients of small integers (token counts), the f64 result is within
2^-53 of the exact rational while f32 halfway points are rationals with
denominator 2^25, so double rounding cannot flip the result — this equals
the correctly-rounded f32 division the reference performs.
"""

from __future__ import annotations

from struct import Struct

_F32 = Struct("<f")


def f32(x: float) -> float:
    """Round a Python float to the nearest binary32 value."""
    return _F32.unpack(_F32.pack(x))[0]


def check_threshold(n_decoded: int, n_skips: int, threshold_f32: float) -> bool:
    """reference: src/utils.rs:6-8. ``threshold_f32`` must be f32-rounded."""
    total = n_decoded + n_skips
    if total == 0:
        return False  # 0/0 is NaN in the reference; NaN >= t is false
    if n_skips == 0:
        return 1.0 >= threshold_f32
    return f32(n_decoded / total) >= threshold_f32
