"""Native C++ parser vs numpy fallback equivalence."""

import numpy as np
import pytest

try:
    from msweep_tpu.native import parse_plaintext as native_parse
except ImportError:
    native_parse = None

from msweep_tpu.io.themisto import _parse_plaintext_pairs_numpy

needs_native = pytest.mark.skipif(native_parse is None, reason="no native toolchain")


def random_alignment(seed=0, n_reads=2000, n_targets=500):
    rng = np.random.default_rng(seed)
    lines = []
    for rid in range(n_reads):
        k = rng.integers(0, 8)
        tgts = rng.choice(n_targets, size=k, replace=False)
        lines.append(" ".join([str(rid)] + [str(t) for t in tgts]))
    return ("\n".join(lines) + "\n").encode()


@needs_native
def test_native_matches_numpy():
    data = random_alignment()
    r1, t1, n1 = native_parse(data)
    r2, t2, n2 = _parse_plaintext_pairs_numpy(data)
    assert n1 == n2
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(t1, t2)


@needs_native
def test_native_no_trailing_newline():
    data = b"0 1 2\n5 3"
    r, t, n = native_parse(data)
    assert n == 2
    np.testing.assert_array_equal(r, [0, 0, 5])
    np.testing.assert_array_equal(t, [1, 2, 3])


@needs_native
def test_native_empty_and_unaligned_lines():
    data = b"0\n1 7\n2\n"
    r, t, n = native_parse(data)
    assert n == 3
    np.testing.assert_array_equal(r, [1])
    np.testing.assert_array_equal(t, [7])


@needs_native
def test_native_malformed_raises():
    with pytest.raises(ValueError):
        native_parse(b"0 1 x\n")


@needs_native
def test_native_large_multichunk():
    data = random_alignment(seed=1, n_reads=50000, n_targets=64)
    r1, t1, n1 = native_parse(data)
    r2, t2, n2 = _parse_plaintext_pairs_numpy(data)
    assert n1 == n2
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(t1, t2)
