"""BitMagic codec tests (io/bitmagic.py, io/packed.py).

Two layers of evidence, since the real BitMagic/alignment-writer libraries
are not available offline (COMPAT.md section 5):

1. Byte-level fixtures: streams built by hand from the documented wire
   layout, so the DECODER is pinned to the format, not merely to our own
   encoder (a decode/encode pair that only agrees with itself would prove
   nothing).
2. Round-trip invariants over adversarial bit patterns.
"""

import io
import struct
import sys

import numpy as np
import pytest

from msweep_tpu.io import bitmagic as bmg
from msweep_tpu.io import packed


def header64(size: int) -> bytes:
    """BM_HM_RESIZE|NO_BO|NO_GAPL|64_BIT header + u64 size."""
    return bytes([bmg.BM_HM_RESIZE | bmg.BM_HM_NO_BO | bmg.BM_HM_NO_GAPL | bmg.BM_HM_64_BIT]) + struct.pack("<Q", size)


def u16(*vals) -> bytes:
    return struct.pack(f"<{len(vals)}H", *vals)


# ---------------------------------------------------------------------------
# byte-level decoder fixtures
# ---------------------------------------------------------------------------

def test_decode_full_header_with_bo_and_gap_levels():
    # default header shape: byte-order byte + 4 u16 gap levels + u32 size
    flags = bmg.BM_HM_RESIZE
    buf = bytes([flags, 1]) + u16(128, 256, 512, 1280) + struct.pack("<I", 200000)
    buf += bytes([bmg.SET_BLOCK_1ZERO, bmg.SET_BLOCK_BIT_1BIT]) + u16(7)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, size = bmg.deserialize(buf)
    assert size == 200000
    assert pos.tolist() == [65536 + 7]


def test_decode_zero_one_runs():
    # 3 zero blocks (8-bit run), 1 full block, end -> bits of block 3
    buf = header64(1 << 20)
    buf += bytes([bmg.SET_BLOCK_8ZERO, 2])  # count-1 = 2 -> 3 blocks
    buf += bytes([bmg.SET_BLOCK_1ONE, bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert len(pos) == bmg.BLOCK_BITS
    assert pos[0] == 3 * bmg.BLOCK_BITS
    assert pos[-1] == 4 * bmg.BLOCK_BITS - 1


def test_decode_16_32_zero_runs_and_azero():
    buf = header64(1 << 24)
    buf += bytes([bmg.SET_BLOCK_16ZERO]) + u16(9)  # 10 blocks
    buf += bytes([bmg.SET_BLOCK_BIT_1BIT]) + u16(1)
    buf += bytes([bmg.SET_BLOCK_32ZERO]) + struct.pack("<I", 4)  # 5 blocks
    buf += bytes([bmg.SET_BLOCK_BIT_1BIT]) + u16(2)
    buf += bytes([bmg.SET_BLOCK_AZERO])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [10 * bmg.BLOCK_BITS + 1, 16 * bmg.BLOCK_BITS + 2]


def test_decode_plain_gap_block():
    # GAP block: first run = 0s over [0..9], 1s over [10..19], 0s to end.
    # words incl head+terminator = 4 -> head len field = 3.
    head = 0 | (3 << 1) | (3 << 3)
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_GAP]) + u16(head, 9, 19)  # terminator implied
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == list(range(10, 20))


def test_decode_gap_block_starting_with_ones():
    # head bit0=1: 1s over [0..4], 0s over [5..65534], 1 at 65535
    head = 1 | (3 << 1) | (3 << 3)
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_GAP]) + u16(head, 4, 65534)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [0, 1, 2, 3, 4, 65535]


def test_decode_arr_and_inv_and_interval():
    buf = header64(4 * bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_ARRGAP]) + u16(3, 5, 100, 65535)
    buf += bytes([bmg.SET_BLOCK_ARRBIT]) + u16(2, 0, 1)
    buf += bytes([bmg.SET_BLOCK_BIT_INTERVAL]) + u16(10, 12)
    buf += bytes([bmg.SET_BLOCK_ARRGAP_INV]) + u16(2, 0, 65535)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    B = bmg.BLOCK_BITS
    expect = [5, 100, 65535, B, B + 1, 2 * B + 10, 2 * B + 11, 2 * B + 12]
    expect += [3 * B + k for k in range(1, 65535)]
    assert pos.tolist() == expect


def test_decode_raw_bit_block():
    words = np.zeros(bmg.BLOCK_WORDS, dtype="<u4")
    words[0] = 0b1001  # bits 0, 3
    words[2047] = 1 << 31  # bit 65535
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_BLOCK_BIT]) + words.tobytes()
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [0, 3, 65535]


def test_decode_bit_0runs():
    # run_type=0 first: 2046 zero words, then 2 nonzero words
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_BIT_0RUNS, 0]) + u16(2046) + u16(2)
    buf += struct.pack("<II", 1, 1 << 5)  # word 2046 bit0, word 2047 bit5
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [2046 * 32, 2047 * 32 + 5]


def test_decode_gamma_array():
    # arrgap_egamma: gamma(len=2), gamma(first+1=6), gamma(delta=10)
    out = bytearray()
    bo = bmg._BitOut(out)
    bo.gamma(2)
    bo.gamma(6)
    bo.gamma(10)
    bo.flush()
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_BLOCK_ARRGAP_EGAMMA]) + bytes(out)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [5, 15]


def test_decode_gamma_gap_block():
    # same block as test_decode_plain_gap_block, gamma-coded:
    # boundaries 9, 19 -> gammas 10, 10 (cumulative v, boundary = v-1)
    out = bytearray()
    bo = bmg._BitOut(out)
    bo.gamma(10)
    bo.gamma(10)
    bo.flush()
    head = 0 | (3 << 1) | (3 << 3)
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_GAP_EGAMMA]) + u16(head) + bytes(out)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == list(range(10, 20))


def test_decode_id_list():
    flags = bmg.BM_HM_DEFAULT | bmg.BM_HM_ID_LIST | bmg.BM_HM_NO_BO | bmg.BM_HM_NO_GAPL
    buf = bytes([flags]) + struct.pack("<I", 3) + struct.pack("<III", 7, 3, 1 << 20)
    pos, _ = bmg.deserialize(buf, size_hint=1 << 21)
    assert pos.tolist() == [3, 7, 1 << 20]


def test_unsupported_opcodes_error_clearly():
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_BLOCK_XOR_REF8])
    with pytest.raises(bmg.BitMagicFormatError, match="opcode 43"):
        bmg.deserialize(buf)
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_SBLOCK_BIENC])
    with pytest.raises(bmg.BitMagicFormatError, match="opcode 41"):
        bmg.deserialize(buf)
    with pytest.raises(bmg.BitMagicFormatError, match="XOR"):
        bmg.deserialize(bytes([bmg.BM_HM_HXOR | bmg.BM_HM_RESIZE]))
    with pytest.raises(bmg.BitMagicFormatError, match="big-endian"):
        bmg.deserialize(bytes([bmg.BM_HM_RESIZE, 0]))
    with pytest.raises(bmg.BitMagicFormatError, match="truncated"):
        bmg.deserialize(header64(bmg.BLOCK_BITS)[:-2])


# ---------------------------------------------------------------------------
# binary interpolative (bienc) fixtures — bit-level, hand-computed
# ---------------------------------------------------------------------------

def test_decode_bienc_array_hand_fixture():
    # positions {3, 10, 20}: header min=3 max=20 n=3; interior [10] coded
    # in [4, 19] -> range 16, b=4, d=0, c=6 long: prefix q=d+(c-d)//2=3 in
    # 3 bits (1,1,0) then t=0 -> bits 1,1,0,0 -> u32 word 3.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_ARR_BIENC]) + u16(3, 20, 3) + struct.pack("<I", 3)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [3, 10, 20]


def test_decode_bienc_array_short_code_fixture():
    # positions {3, 5, 9, 19}: interior [5, 9] in [4, 18].
    #   mid (idx 1) val=9 in [5, 18]: range 14, b=4, d=2, c=4 long ->
    #     prefix q=2+(4-2)//2=3 in 3 bits (1,1,0) then t=0
    #   left val=5 in [4, 8]: range 5, b=3, d=3, c=1 < d ->
    #     SHORT code 1 in 2 bits (1,0)
    # bit sequence 1,1,0,0,1,0 -> u32 word 0b010011 = 19.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_ARR_BIENC]) + u16(3, 19, 4) + struct.pack("<I", 19)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [3, 5, 9, 19]


def test_decode_bienc_array_two_elements_no_bits():
    # n=2: min and max only, zero-length bitstream.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_ARR_BIENC]) + u16(100, 60000, 2)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [100, 60000]


def test_decode_bienc_array_inv():
    # inverse: all block bits EXCEPT {3, 10, 20} (same payload as above).
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_ARR_BIENC_INV]) + u16(3, 20, 3) + struct.pack("<I", 3)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert len(pos) == bmg.BLOCK_BITS - 3
    assert not np.isin([3, 10, 20], pos).any()


def test_decode_gap_bienc_hand_fixture():
    # GAP runs: zeros 0-4, ones 5-9, zeros to end.  head: len word count
    # total 4 (head + 2 boundaries + implied terminator) -> head = 3<<3,
    # first_val=0.  min boundary 4 explicit; remaining boundary [9] BIC
    # in [5, 65534]: range 65530, b=16, d=6, c=4 < d -> SHORT code 4 in
    # 15 bits -> u32 word 4.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_GAP_BIENC]) + u16(3 << 3, 4) + struct.pack("<I", 4)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [5, 6, 7, 8, 9]


def test_decode_bitgap_bienc_same_payload():
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_BITGAP_BIENC]) + u16(3 << 3, 4) + struct.pack("<I", 4)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [5, 6, 7, 8, 9]


@pytest.mark.parametrize("seed,n", [(0, 3), (1, 17), (2, 200), (3, 4000)])
def test_bienc_array_encode_decode_roundtrip(seed, n):
    # Random sorted position arrays through the fixture encoder and the
    # production decoder (pins decoder <-> documented layout both ways).
    rng = np.random.default_rng(seed)
    pos = np.sort(rng.choice(bmg.BLOCK_BITS, size=n, replace=False)).astype(np.uint32)
    payload = bytearray()
    bmg._encode_bienc_array(payload, pos)
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_BLOCK_ARR_BIENC]) + bytes(payload)
    buf += bytes([bmg.SET_BLOCK_END])
    out, _ = bmg.deserialize(buf)
    assert out.tolist() == pos.tolist()


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_gap_bienc_encode_decode_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n_bounds = int(rng.integers(2, 40))
    bounds = np.sort(rng.choice(bmg.GAP_MAX_BITS - 2, size=n_bounds, replace=False))
    boundaries = np.concatenate([bounds, [bmg.GAP_MAX_BITS - 1]]).astype(np.uint32)
    first_val = int(rng.integers(0, 2))
    total = len(boundaries) + 1  # + head word
    head = first_val | ((total - 1) << 3)
    payload = bytearray()
    bmg._encode_gap_bienc(payload, head, boundaries)
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_BLOCK_GAP_BIENC]) + bytes(payload)
    buf += bytes([bmg.SET_BLOCK_END])
    out, _ = bmg.deserialize(buf)
    expect = bmg._gap_to_positions(head, boundaries)
    assert out.tolist() == expect.tolist()


def test_decode_bienc_array_v2_hand_fixture():
    # positions {3, 10, 65530}: v2 header u8 min=3, u8 tail=65535-65530=5,
    # u16 n=3; interior [10] coded in [4, 65529] -> range 65526, b=16,
    # d=65536-65526=10, c=10-4=6 < d -> SHORT code 6 in 15 bits -> word 6.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_ARR_BIENC_V2, 3, 5]) + u16(3) + struct.pack("<I", 6)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [3, 10, 65530]


def test_decode_bienc_array_inv_v2():
    # same payload, inverted semantics.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_ARR_BIENC_INV_V2, 3, 5]) + u16(3) + struct.pack("<I", 6)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert len(pos) == bmg.BLOCK_BITS - 3
    assert not np.isin([3, 10, 65530], pos).any()


def test_decode_gap_bienc_v2_hand_fixture():
    # GAP runs: [0..4]=0, [5..9]=1, [10..65529]=0, [65530..65535]=1.
    # Boundaries [4, 9, 65529, 65535]: total words = head + 3 explicit
    # + terminator = 5 -> head = 4<<3 = 32, first_val=0.  v2 header:
    # u8 min=4, u8 tail=65535-65529=6; interior [9] BIC in [5, 65528] ->
    # range 65524, b=16, d=12, c=4 < d -> SHORT code 4 in 15 bits -> word 4.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_GAP_BIENC_V2]) + u16(4 << 3) + bytes([4, 6])
    buf += struct.pack("<I", 4)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [5, 6, 7, 8, 9] + list(range(65530, 65536))


def test_gap_bienc_v2_zero_tail_delta_rejected():
    # tail delta 0 would make the last explicit boundary duplicate the
    # implied 65535 terminator — corrupt, must fail loudly (ADVICE r04).
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_GAP_BIENC_V2]) + u16(4 << 3) + bytes([4, 0])
    buf += struct.pack("<I", 4)
    buf += bytes([bmg.SET_BLOCK_END])
    with pytest.raises(bmg.BitMagicFormatError, match="bounds"):
        bmg.deserialize(buf)


def test_strict_mode_rejects_unvalidated_opcodes(monkeypatch):
    # MSWEEP_BM_STRICT=1 restores the hard error on the opcodes whose
    # reconstructed layout is unvalidated against a real bm build.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_GAP_BIENC_V2]) + u16(4 << 3) + bytes([4, 6])
    buf += struct.pack("<I", 4)
    buf += bytes([bmg.SET_BLOCK_END])
    monkeypatch.setenv("MSWEEP_BM_STRICT", "1")
    with pytest.raises(bmg.BitMagicFormatError, match="MSWEEP_BM_STRICT"):
        bmg.deserialize(buf)
    monkeypatch.delenv("MSWEEP_BM_STRICT")
    pos, _ = bmg.deserialize(buf)  # permissive default still decodes
    assert len(pos)


def test_decode_bitgap_bienc_v2_same_payload():
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_BITGAP_BIENC_V2]) + u16(4 << 3) + bytes([4, 6])
    buf += struct.pack("<I", 4)
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [5, 6, 7, 8, 9] + list(range(65530, 65536))


@pytest.mark.parametrize("seed,n", [(10, 3), (11, 40), (12, 2000)])
def test_bienc_array_v2_encode_decode_roundtrip(seed, n):
    # v2 applies only when min < 256 and 65535-max < 256; constrain both.
    rng = np.random.default_rng(seed)
    mid = np.sort(rng.choice(bmg.BLOCK_BITS - 2, size=n - 2, replace=False))[: n - 2]
    pos = np.unique(
        np.concatenate([[int(rng.integers(0, 256))], mid,
                        [bmg.BLOCK_BITS - 1 - int(rng.integers(0, 256))]])
    ).astype(np.uint32)
    payload = bytearray()
    bmg._encode_bienc_array_v2(payload, pos)
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_BLOCK_ARR_BIENC_V2]) + bytes(payload)
    buf += bytes([bmg.SET_BLOCK_END])
    out, _ = bmg.deserialize(buf)
    assert out.tolist() == pos.tolist()


@pytest.mark.parametrize("seed", [13, 14, 15])
def test_gap_bienc_v2_encode_decode_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n_interior = int(rng.integers(0, 30))
    lo = int(rng.integers(0, 256))
    hi = bmg.GAP_MAX_BITS - 2 - int(rng.integers(0, 255))
    interior = np.sort(rng.choice(np.arange(lo + 1, hi), size=n_interior, replace=False))
    boundaries = np.concatenate(
        [[lo], interior, [hi], [bmg.GAP_MAX_BITS - 1]]
    ).astype(np.uint32)
    first_val = int(rng.integers(0, 2))
    total = len(boundaries) + 1  # + head word
    head = first_val | ((total - 1) << 3)
    payload = bytearray()
    bmg._encode_gap_bienc_v2(payload, head, boundaries)
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_BLOCK_GAP_BIENC_V2]) + bytes(payload)
    buf += bytes([bmg.SET_BLOCK_END])
    out, _ = bmg.deserialize(buf)
    expect = bmg._gap_to_positions(head, boundaries)
    assert out.tolist() == expect.tolist()


def test_decode_bit_digest0_hand_fixture():
    # positions {5, 1025, 65535}: waves 0, 1, 63 nonzero ->
    # digest bits 0, 1, 63; each wave ships 32 raw u32 words.
    wave0 = np.zeros(32, dtype="<u4"); wave0[0] = 1 << 5
    wave1 = np.zeros(32, dtype="<u4"); wave1[0] = 2  # 1025 & 31 == 1
    wave63 = np.zeros(32, dtype="<u4"); wave63[31] = 1 << 31
    digest = 1 | 2 | (1 << 63)
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_BIT_DIGEST0]) + struct.pack("<Q", digest)
    buf += wave0.tobytes() + wave1.tobytes() + wave63.tobytes()
    buf += bytes([bmg.SET_BLOCK_END])
    pos, _ = bmg.deserialize(buf)
    assert pos.tolist() == [5, 1025, 65535]


@pytest.mark.parametrize("seed,n", [(20, 1), (21, 64), (22, 5000)])
def test_bit_digest0_encode_decode_roundtrip(seed, n):
    rng = np.random.default_rng(seed)
    pos = np.sort(rng.choice(bmg.BLOCK_BITS, size=n, replace=False)).astype(np.uint32)
    payload = bytearray()
    bmg._encode_bit_digest0(payload, pos)
    buf = header64(bmg.BLOCK_BITS) + bytes([bmg.SET_BLOCK_BIT_DIGEST0]) + bytes(payload)
    buf += bytes([bmg.SET_BLOCK_END])
    out, _ = bmg.deserialize(buf)
    assert out.tolist() == pos.tolist()


def test_bienc_corrupt_stream_raises_not_corrupts():
    # A bitstream whose decoded mid violates its feasible range must
    # raise, not return garbage: n=300 interior values can't fit in a
    # 10-wide range.
    buf = header64(bmg.BLOCK_BITS)
    buf += bytes([bmg.SET_BLOCK_ARR_BIENC]) + u16(3, 13, 300) + struct.pack("<I", 0)
    buf += bytes([bmg.SET_BLOCK_END])
    with pytest.raises(bmg.BitMagicFormatError):
        bmg.deserialize(buf)


# ---------------------------------------------------------------------------
# round-trip invariants
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pattern", ["sparse", "dense", "clustered", "full_blocks", "empty", "runs"])
def test_serialize_roundtrip(pattern):
    rng = np.random.default_rng(hash(pattern) % 2**32)
    size = 5 * bmg.BLOCK_BITS + 1234
    if pattern == "sparse":
        pos = rng.choice(size, 300, replace=False)
    elif pattern == "dense":
        pos = rng.choice(size, size // 2, replace=False)
    elif pattern == "clustered":
        centers = rng.choice(size - 200, 20)
        pos = np.unique((centers[:, None] + np.arange(150)).ravel())
    elif pattern == "full_blocks":
        pos = np.concatenate([
            np.arange(bmg.BLOCK_BITS, 2 * bmg.BLOCK_BITS),
            [0, size - 1],
        ])
    elif pattern == "runs":
        pos = np.concatenate([np.arange(100, 40000), np.arange(300000, 300005)])
    else:
        pos = np.array([], dtype=np.uint64)
    pos = np.unique(pos.astype(np.uint64))
    blob = bmg.serialize(pos, size)
    got, got_size = bmg.deserialize(blob)
    assert got_size == size
    np.testing.assert_array_equal(got, pos)


def test_roundtrip_bit1bit_and_single_block():
    pos = np.array([bmg.BLOCK_BITS + 42], dtype=np.uint64)
    blob = bmg.serialize(pos, 4 * bmg.BLOCK_BITS)
    # encoder picks zero-run + bit_1bit
    assert bmg.SET_BLOCK_BIT_1BIT in blob
    got, _ = bmg.deserialize(blob)
    np.testing.assert_array_equal(got, pos)


# ---------------------------------------------------------------------------
# packed alignment framing
# ---------------------------------------------------------------------------

def _pairs(rng, n_reads, n_refs, density=0.05):
    n = int(n_reads * n_refs * density)
    reads = rng.integers(0, n_reads, n)
    tgts = rng.integers(0, n_refs, n)
    return reads.astype(np.uint64), tgts.astype(np.uint64)


def test_pack_parse_roundtrip():
    rng = np.random.default_rng(0)
    reads, tgts = _pairs(rng, 500, 40)
    blob = packed.pack_pairs(reads, tgts, 500, 40)
    assert packed.looks_packed(blob)
    r2, t2, n_reads = packed.parse_packed_pairs(blob, 40)
    assert n_reads == 500
    keys = np.unique(reads * np.uint64(40) + tgts)
    np.testing.assert_array_equal(r2 * np.uint64(40) + t2, keys)


def test_pack_multichunk_roundtrip(monkeypatch):
    monkeypatch.setattr(packed, "CHUNK_READS", 100)
    rng = np.random.default_rng(1)
    reads, tgts = _pairs(rng, 950, 16)
    blob = packed.pack_pairs(reads, tgts, 950, 16)
    assert blob.count(b"\n") > 2  # several size lines
    r2, t2, _ = packed.parse_packed_pairs(blob, 16)
    keys = np.unique(reads * np.uint64(16) + tgts)
    np.testing.assert_array_equal(r2 * np.uint64(16) + t2, keys)


def test_legacy_v1_format_still_reads():
    keys = np.array([3, 17, 94], dtype=np.uint64)
    deltas = np.diff(keys, prepend=np.uint64(0)).astype("<u8")
    import zlib

    payload = zlib.compress(deltas.tobytes(), 6)
    buf = b"10,10\n" + packed.MAGIC + b"\tv1\t3\n" + payload
    r, t, n = packed.parse_packed_pairs(buf, 10)
    assert n == 10
    np.testing.assert_array_equal(r * np.uint64(10) + t, keys)


def test_header_mismatch_errors():
    blob = packed.pack_pairs(
        np.array([0], dtype=np.uint64), np.array([1], dtype=np.uint64), 4, 8
    )
    with pytest.raises(ValueError, match="more target"):
        packed.parse_packed_pairs(blob, 6)
    with pytest.raises(ValueError, match="less target"):
        packed.parse_packed_pairs(blob, 12)


def test_packed_cli_end_to_end(tmp_path):
    """Full pipeline: plaintext twin vs packed input give identical output."""
    from msweep_tpu.cli import main

    rng = np.random.default_rng(7)
    n_reads, n_refs = 120, 8
    lines = []
    pairs = []
    for r in range(n_reads):
        k = int(rng.integers(1, 4))
        tg = np.unique(rng.integers(0, n_refs, k))
        lines.append(f"{r} " + " ".join(map(str, tg)))
        pairs.extend((r, int(t)) for t in tg)
    plaintext = "\n".join(lines) + "\n"
    (tmp_path / "aln.txt").write_text(plaintext)
    reads = np.array([p[0] for p in pairs], dtype=np.uint64)
    tgts = np.array([p[1] for p in pairs], dtype=np.uint64)
    (tmp_path / "aln.aln").write_bytes(
        packed.pack_pairs(reads, tgts, n_reads, n_refs)
    )
    (tmp_path / "groups.txt").write_text(
        "\n".join(f"g{i % 3}" for i in range(n_refs)) + "\n"
    )
    for inp, prefix in (("aln.txt", "plain"), ("aln.aln", "packed")):
        rc = main([
            "--themisto", str(tmp_path / inp),
            "-i", str(tmp_path / "groups.txt"),
            "-o", str(tmp_path / prefix),
        ])
        assert rc == 0
    plain = (tmp_path / "plain_abundances.txt").read_text()
    pk = (tmp_path / "packed_abundances.txt").read_text()
    assert plain == pk


def test_pack_cli_tool_roundtrip(tmp_path, capsys, monkeypatch):
    """msweep-tpu pack -> unpack reproduces the plaintext alignment."""
    from msweep_tpu import cli_pack

    text = "0 1 3\n1\n2 0 1 2 3\n"
    (tmp_path / "in.txt").write_text(text)
    # pack to bytes
    rc = cli_pack.main(["pack", "-n", "4", str(tmp_path / "in.txt")])
    assert rc == 0
    blob = capsys.readouterr().out.encode() if False else None
    # capsys can't capture raw stdout.buffer reliably; go through the API
    from msweep_tpu.io.themisto import parse_plaintext_pairs

    reads, tgts, n_reads = parse_plaintext_pairs(text.encode())
    blob = packed.pack_pairs(reads, tgts, n_reads, 4)
    (tmp_path / "in.aln").write_bytes(blob)
    monkeypatch.setattr(sys, "stdout", io.TextIOWrapper(io.BytesIO(), write_through=True))
    rc = cli_pack.main(["unpack", str(tmp_path / "in.aln")])
    assert rc == 0
    sys.stdout.flush()
    out = sys.stdout.buffer.getvalue().decode()
    assert out == text
