"""Fit result with O(G) abundances and lazy gamma materialization.

The reference's plain abundance run only ever consumes theta
(src/mSWEEP.cpp:419-423: mixture_components -> write _abundances.txt);
the (E, G) probability matrix is needed only for --write-probs /
--print-probs / --bin-reads (src/mSWEEP.cpp:430-469).  FitResult keeps
that distinction on device: `theta` and `pseudocounts` come straight
from the O(G) optimizer state, and the big matrix is materialized only
when `.gamma()` is explicitly called.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass(frozen=True)
class FitResult:
    theta: Any  # (G_pad,) abundances (acc dtype), from optimizer state
    n_iters: Any  # int32 scalar
    objective: Any  # final ELBO / EM objective (acc scalar)
    pseudocounts: Any  # (G_pad,) a_g = sum_e c_e p_eg = theta * sum(c) (RATE)
    _gamma_fn: Callable[[], Any]  # materializes (E_pad, G_pad) log-probs

    def gamma(self):
        """Materialize the full (E_pad, G_pad) log-probability matrix.

        One streaming pass over logL on the implicit path; only call
        when probs output / binning actually needs the matrix."""
        return self._gamma_fn()
