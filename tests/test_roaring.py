"""Roaring deletion-vector codec (round 10): Z85, 32-bit portable
roaring containers, the 64-bit RoaringBitmapArray, and the .bin
framing — property round-trips plus spec-pinned byte vectors."""

from __future__ import annotations

import struct
import uuid

import numpy as np
import pytest

from etl_loading_scripts_spark.operators import roaring as R


def test_z85_spec_vector_and_uuid_roundtrip():
    # the ZeroMQ Z85 reference test vector (spec 32/Z85)
    assert R.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert R.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    for _ in range(20):
        u = uuid.uuid4()
        assert R.decode_dv_uuid(R.encode_dv_uuid(u)) == u
    # non-multiple-of-4 payloads zero-pad; sizeInBytes recovers length
    raw = b"\x01\x02\x03\x04\x05"
    assert R.z85_decode(R.z85_encode(raw), 5) == raw
    with pytest.raises(ValueError):
        R.z85_decode("~~~~~")  # not in the alphabet
    with pytest.raises(ValueError):
        R.decode_dv_uuid("abc")


@pytest.mark.parametrize(
    "case",
    [
        np.array([], dtype=np.uint64),
        np.array([0], dtype=np.uint64),
        np.array([5, 5, 7, 100_000], dtype=np.uint64),  # dup collapses
        np.arange(70_000, dtype=np.uint64),  # dense: bitmap containers
        np.array([2**33 + 5, 17, 2**32], dtype=np.uint64),  # multi-bucket
        np.array([65535, 65536, 131071], dtype=np.uint64),  # container edges
    ],
    ids=["empty", "zero", "small", "dense", "multibucket", "edges"],
)
def test_rbm64_roundtrip(case):
    back = R.deserialize_rbm64(R.serialize_rbm64(case))
    assert np.array_equal(back, np.unique(case))


def test_rbm64_random_roundtrip():
    rng = np.random.default_rng(11)
    for n, hi in [(50_000, 1_000_000), (5_000, 2**40), (1, 2**50)]:
        vals = rng.integers(0, hi, size=n, dtype=np.uint64)
        back = R.deserialize_rbm64(R.serialize_rbm64(vals))
        assert np.array_equal(back, np.unique(vals))


def test_reader_decodes_run_containers():
    """The reader must decode the run-container cookie (12347) even
    though this writer never emits it — externally-written DVs can."""
    cookie = struct.pack("<I", (0 << 16) | 12347)  # 1 container
    runflags = bytes([1])
    desc = struct.pack("<HH", 3, 9)  # key=3, cardinality-1=9
    payload = struct.pack("<H", 2) + struct.pack("<HHHH", 10, 4, 100, 4)
    key = struct.pack("<I", 0)  # the bitmap's uint32 LE high-32 key
    buf = struct.pack("<iq", R._MAGIC, 1) + key + cookie + runflags + desc + payload
    vals = R.deserialize_rbm64(buf)
    exp = np.array(
        [(3 << 16) | v for v in list(range(10, 15)) + list(range(100, 105))],
        dtype=np.uint64,
    )
    assert np.array_equal(vals, exp)


def test_magic_number_pinned_and_rejected():
    b = R.serialize_rbm64(np.array([1, 2], dtype=np.uint64))
    assert struct.unpack_from("<i", b, 0)[0] == 1681511377  # PROTOCOL.md
    with pytest.raises(ValueError, match="magic"):
        R.deserialize_rbm64(b"\x00" * 12)


def test_keyed_sparse_layout_pinned():
    """ADVICE r10 (high): the RoaringBitmapArray must store only
    NON-EMPTY bitmaps, each prefixed with its uint32 LE key — a dense
    bucket 0..max layout is unreadable by conformant Delta readers and
    explodes a single high position into megabytes of empty buckets."""
    # one position near 2^50 → exactly one keyed bitmap, tens of bytes
    hi = np.array([2**50 + 7], dtype=np.uint64)
    b = R.serialize_rbm64(hi)
    assert len(b) < 64, f"sparse high position serialized {len(b)} bytes"
    magic, n = struct.unpack_from("<iq", b, 0)
    assert (magic, n) == (R._MAGIC, 1)
    (key,) = struct.unpack_from("<I", b, 12)
    assert key == (2**50 + 7) >> 32
    # two buckets far apart → two keyed bitmaps, keys ascending
    two = R.serialize_rbm64(np.array([5, 2**40 + 1], dtype=np.uint64))
    _, n2 = struct.unpack_from("<iq", two, 0)
    assert n2 == 2
    (k0,) = struct.unpack_from("<I", two, 12)
    assert k0 == 0
    assert np.array_equal(
        R.deserialize_rbm64(two), np.array([5, 2**40 + 1], dtype=np.uint64)
    )


def test_out_of_order_foreign_keys_still_sorted():
    """A foreign writer emitting bitmap keys out of ascending order
    must still decode to sorted positions."""
    bm_a = R._serialize_rb32(np.array([7], dtype=np.uint32))
    bm_b = R._serialize_rb32(np.array([3], dtype=np.uint32))
    buf = (
        struct.pack("<iq", R._MAGIC, 2)
        + struct.pack("<I", 5)
        + bm_a
        + struct.pack("<I", 1)
        + bm_b
    )
    exp = np.array([(1 << 32) | 3, (5 << 32) | 7], dtype=np.uint64)
    assert np.array_equal(R.deserialize_rbm64(buf), exp)


def test_dv_file_framing_and_crc():
    blobs = [
        R.serialize_rbm64(np.array([1, 5, 9], dtype=np.uint64)),
        R.serialize_rbm64(np.arange(10_000, dtype=np.uint64)),
    ]
    buf, offs = R.pack_dv_file(blobs)
    assert buf[0] == R.DV_FILE_VERSION == 1
    for blob, off in zip(blobs, offs):
        assert R.unpack_dv_blob(buf, off, len(blob)) == blob
    # a flipped byte fails the CRC; a wrong sizeInBytes fails up front
    corrupt = bytearray(buf)
    corrupt[offs[0] + 4] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        R.unpack_dv_blob(bytes(corrupt), offs[0], len(blobs[0]))
    with pytest.raises(ValueError, match="length mismatch"):
        R.unpack_dv_blob(buf, offs[0], len(blobs[0]) + 1)


def test_hypothesis_roundtrip():
    hyp = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**34),
            min_size=0,
            max_size=2_000,
        )
    )
    def roundtrips(vals):
        arr = np.array(vals, dtype=np.uint64)
        assert np.array_equal(
            R.deserialize_rbm64(R.serialize_rbm64(arr)), np.unique(arr)
        )

    roundtrips()


def test_run_container_full_range_no_uint16_wrap():
    """A run reaching the top of the 16-bit space (start 65000,
    length 535 → values 65000..65535) must decode completely — under
    NumPy 2's NEP-50 promotion, uint16 arithmetic would silently wrap
    to an empty range without the int() widening in the decoder."""
    cookie = struct.pack("<I", (0 << 16) | 12347)
    runflags = bytes([1])
    desc = struct.pack("<HH", 0, 535)  # key=0, cardinality-1
    payload = struct.pack("<H", 1) + struct.pack("<HH", 65000, 535)
    key = struct.pack("<I", 0)
    buf = struct.pack("<iq", R._MAGIC, 1) + key + cookie + runflags + desc + payload
    vals = R.deserialize_rbm64(buf)
    assert np.array_equal(vals, np.arange(65000, 65536, dtype=np.uint64))


def test_z85_overflow_group_raises_value_error():
    # '%nSc1' + all-max group: a 5-char group can encode > 2^32-1;
    # the codec's contract is ValueError, never OverflowError
    with pytest.raises(ValueError, match="exceeds"):
        R.z85_decode("#####")
