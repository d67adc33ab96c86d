"""Themisto plaintext pseudoalignment parsing (layer L2 input side).

Row format (include/mSWEEP_alignment.hpp:54-66): `read_id tgt tgt ...`,
space-separated, 0-based ids; a read with no pseudoalignments is a line
with only its read id.  The reference streams lines into one bitvector of
size n_reads*n_targets; here we parse the whole (possibly compressed)
buffer into flat (read_id, target_id) pair arrays with vectorized numpy —
the TPU-native analog of the reference's bulk_insert_iterator path — and
merge paired strands with set operations on 64-bit (read,target) keys
(bit_and/bit_or at include/mSWEEP_alignment.hpp:126-133).

An optional C++ fast path (msweep_tpu.native) accelerates tokenization.
"""

from __future__ import annotations

import numpy as np


def count_lines(data: bytes) -> int:
    """Number of lines the reference's getline loop would read."""
    if not data:
        return 0
    n = data.count(b"\n")
    if not data.endswith(b"\n"):
        n += 1
    return n


def parse_plaintext_pairs(data: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Parse a plaintext Themisto alignment buffer.

    Returns (read_ids, target_ids) as uint64 arrays (one entry per
    alignment pair, in file order) and the number of reads (= lines,
    matching n_queries at include/mSWEEP_alignment.hpp:121).
    """
    try:
        from ..native import parse_plaintext as _native_parse

        return _native_parse(data)
    except ImportError:
        pass
    return _parse_plaintext_pairs_numpy(data)


def _parse_plaintext_pairs_numpy(data: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    n_reads = count_lines(data)
    if n_reads == 0:
        return (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.uint64),
            0,
        )

    buf = np.frombuffer(data, dtype=np.uint8)
    # Token starts: non-whitespace byte preceded by whitespace (or BOF).
    is_ws = (buf == 32) | (buf == 10) | (buf == 13) | (buf == 9)
    prev_ws = np.empty_like(is_ws)
    prev_ws[0] = True
    prev_ws[1:] = is_ws[:-1]
    token_starts = np.flatnonzero(~is_ws & prev_ws)
    if token_starts.size == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64), n_reads

    # data.split() yields tokens in the same order as token_starts.
    tokens = np.array(data.split())  # bytes -> |S dtype
    try:
        values = tokens.astype(np.uint64)
    except ValueError as e:
        raise ValueError(f"File format not supported: {e}") from e

    # Which line does each token live on?
    newline_pos = np.flatnonzero(buf == 10)
    line_of_token = np.searchsorted(newline_pos, token_starts, side="right")

    # First token on each line is the read id; the rest are targets.
    first_of_line = np.empty(values.shape[0], dtype=bool)
    first_of_line[0] = True
    first_of_line[1:] = line_of_token[1:] != line_of_token[:-1]

    read_id_values = values[first_of_line]
    # Map each token to the read id of its line: cumsum over first_of_line
    # gives a 1-based index into read_id_values.
    line_ordinal = np.cumsum(first_of_line) - 1
    read_of_token = read_id_values[line_ordinal]

    target_mask = ~first_of_line
    return (
        read_of_token[target_mask],
        values[target_mask],
        n_reads,
    )


def _pair_keys(read_ids: np.ndarray, target_ids: np.ndarray, n_targets: int) -> np.ndarray:
    """Sorted unique 64-bit keys read*n_targets+target (the reference's
    bit indices, include/mSWEEP_alignment.hpp:64)."""
    keys = read_ids * np.uint64(n_targets) + target_ids
    keys = np.unique(keys)  # sorted; duplicates in the file collapse like bit set
    return keys


def merge_strands(
    strand_pairs: list[tuple[np.ndarray, np.ndarray]],
    n_targets: int,
    mode: str = "intersection",
) -> np.ndarray:
    """Merge per-strand alignment pair sets into one sorted key array.

    `mode` semantics match include/mSWEEP_alignment.hpp:126-133: the first
    strand initializes, later strands AND (intersection) or OR (union);
    any other mode raises (including the advertised-but-broken "unpaired",
    SURVEY.md section 9.3 — it only "works" with a single input file, where the
    merge never runs; we reproduce that by accepting any mode for 1 file).
    """
    merged: np.ndarray | None = None
    for read_ids, target_ids in strand_pairs:
        keys = _pair_keys(read_ids, target_ids, n_targets)
        if merged is None:
            merged = keys
        elif mode == "intersection":
            merged = np.intersect1d(merged, keys, assume_unique=True)
        elif mode == "union":
            merged = np.union1d(merged, keys)
        else:
            raise ValueError(f"Unrecognized option `{mode}` for --themisto-mode")
    assert merged is not None
    return merged
