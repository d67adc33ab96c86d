"""Packed pseudoalignment codec (alignment-writer replacement).

The reference consumes alignments packed by the external
`alignment-writer` library: a `"n_reads,n_refs"` header line followed by
serialized BitMagic bitvector chunks (include/mSWEEP_alignment.hpp:103-114),
autodetected by a ',' in the first line.  alignment-writer and its
vendored BitMagic are FetchContent deps absent from the snapshot, and the
BitMagic serialization wire format cannot be reimplemented blind with
nothing to validate against — so this module provides a functionally
equivalent codec with the SAME header contract and autodetection:

    n_reads,n_refs\n
    #msweep-tpu-pack\tv1\t<n_pairs>\n
    <zlib-compressed little-endian uint64 delta-encoded keys>

Keys are read*n_refs+target (the reference's bit indices), sorted;
delta coding + zlib gives comparable compression to the GAP-coded
bitvectors for typical sparse alignments.  Feeding a genuine
alignment-writer (.aln) file produces a clear error naming the format.

`msweep-tpu pack|unpack` (cli_pack.py) mirrors the standalone
alignment-writer binary used in docs/example.md:36-40.
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC = b"#msweep-tpu-pack"


def looks_packed(buf: bytes) -> bool:
    """Autodetect like the reference: ',' in the first line
    (include/mSWEEP_alignment.hpp:103)."""
    nl = buf.find(b"\n")
    first = buf[: nl if nl >= 0 else len(buf)]
    return b"," in first


def read_header(line: bytes) -> tuple[int, int]:
    """alignment_writer::ReadHeader equivalent: 'n_reads,n_refs'."""
    parts = line.strip().split(b",")
    if len(parts) != 2:
        raise ValueError(f"invalid packed alignment header: {line!r}")
    return int(parts[0]), int(parts[1])


def pack_pairs(
    read_ids: np.ndarray, target_ids: np.ndarray, n_reads: int, n_refs: int, level: int = 6
) -> bytes:
    keys = np.unique(
        read_ids.astype(np.uint64) * np.uint64(n_refs) + target_ids.astype(np.uint64)
    )
    deltas = np.empty_like(keys)
    if len(keys):
        deltas[0] = keys[0]
        np.subtract(keys[1:], keys[:-1], out=deltas[1:])
    payload = zlib.compress(deltas.astype("<u8").tobytes(), level)
    header = f"{n_reads},{n_refs}\n".encode()
    meta = MAGIC + f"\tv1\t{len(keys)}\n".encode()
    return header + meta + payload


def parse_packed_pairs(buf: bytes, expected_n_refs: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Unpack to (read_ids, target_ids, n_reads) like the plaintext parser.

    Raises with the reference's wording when target counts mismatch
    (include/mSWEEP_alignment.hpp:107-111).
    """
    nl1 = buf.find(b"\n")
    n_reads, n_refs = read_header(buf[:nl1])
    if n_refs > expected_n_refs:
        raise ValueError("Pseudoalignment file has more target sequences than expected.")
    if n_refs < expected_n_refs:
        raise ValueError("Pseudoalignment file has less target sequences than expected.")
    nl2 = buf.find(b"\n", nl1 + 1)
    meta = buf[nl1 + 1 : nl2]
    if not meta.startswith(MAGIC):
        raise ValueError(
            "This looks like a BitMagic alignment-writer (.aln) file, which "
            "msweep-tpu cannot decode; re-pack the plaintext alignment with "
            "`msweep-tpu pack` (see io/packed.py)."
        )
    fields = meta.split(b"\t")
    if fields[1] != b"v1":
        raise ValueError(f"unsupported msweep-tpu-pack version {fields[1]!r}")
    n_pairs = int(fields[2])
    deltas = np.frombuffer(zlib.decompress(buf[nl2 + 1 :]), dtype="<u8")
    if len(deltas) != n_pairs:
        raise ValueError("packed alignment payload is truncated")
    keys = np.cumsum(deltas, dtype=np.uint64)
    return keys // np.uint64(n_refs), keys % np.uint64(n_refs), n_reads
