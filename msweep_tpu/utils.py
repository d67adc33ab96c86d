"""Shared small utilities: TPU-friendly padding and dtype policy.

TPU arrays want the last (lane) dimension padded to 128 and the
second-to-last (sublane) dimension padded to 8 for f32 (see
/opt/skills/guides/pallas_guide.md, "Tiling Constraints").  All dense
device arrays in this package use the (E, G) = (equivalence classes,
groups) layout: E is the long, sharded axis; G rides the lanes.

The reference's adaptive integer-width dispatch (include/Likelihood.hpp:334-380,
src/Grouping.cpp:46-88) collapses on TPU to numpy dtype choices made in
:func:`min_uint_dtype`.
"""

from __future__ import annotations

import numpy as np

LANE = 128
SUBLANE = 8

# Large negative stand-in for log(0). Finite so that arithmetic like
# NEG - NEG = 0 stays NaN-free, and exp(NEG + anything_reasonable)
# underflows to exactly 0.0 in both f32 and f64. Deliberately NOT
# -1e30: TPU exp's range reduction (x * log2e into an integer exponent)
# produces garbage for |x| >~ 2^31, observed as exp(-1e30) ~ 5e-7 on
# v5e — -1e8 is far below the exp-underflow knee (~-103 in f32) while
# staying safely inside the int32 range-reduction window.
NEG = -1.0e8

# Entries below this are padding (real log-likelihood values are
# O(k log n), never anywhere near NEG).
PAD_THRESHOLD = NEG * 0.5


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_axis(arr: np.ndarray, axis: int, target: int, fill) -> np.ndarray:
    """Pad `arr` along `axis` up to length `target` with `fill`."""
    cur = arr.shape[axis]
    if cur == target:
        return arr
    if cur > target:
        raise ValueError(f"cannot pad axis {axis} from {cur} down to {target}")
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - cur)
    return np.pad(arr, widths, mode="constant", constant_values=fill)


def min_uint_dtype(max_value: int) -> np.dtype:
    """Smallest unsigned integer dtype that can hold `max_value`.

    TPU-side note: int8/int16 count tables halve HBM traffic for the
    likelihood gather; the adaptive-width idea from the reference
    (src/Grouping.cpp:46-88) survives as this dtype choice.
    """
    for dt in (np.uint8, np.uint16, np.uint32, np.uint64):
        if max_value <= np.iinfo(dt).max:
            return np.dtype(dt)
    raise ValueError(f"value {max_value} too large")
