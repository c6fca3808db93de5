"""MP4/ISO-BMFF box parser (llm/mp4.py): tree walk, largesize escape,
triage summary, and the corrupt-capture quarantine contract."""

from __future__ import annotations

import struct

import pytest

from etl_loading_scripts_spark.llm.mp4 import (
    _box,
    mp4_summary,
    parse_mp4_boxes,
    write_mp4_stub,
)


def test_box_tree_and_summary_roundtrip():
    payload = write_mp4_stub(
        timescale=600, duration=600 * 42,
        track_handlers=[b"vide", b"soun"],
        mdat_payload=b"\x42" * 100,
    )
    boxes = parse_mp4_boxes(payload)
    assert [b["type"] for b in boxes if b["depth"] == 0] == [
        "ftyp", "moov", "mdat",
    ]
    assert [b["type"] for b in boxes if b["depth"] == 1] == [
        "mvhd", "trak", "trak",
    ]
    s = mp4_summary(payload)
    assert s["n_tracks"] == 2
    assert s["handlers"] == ["soun", "vide"]
    assert s["duration_ms"] == 42_000
    assert s["mdat_bytes"] == 100
    # offsets+sizes tile the file exactly at depth 0
    top = [b for b in boxes if b["depth"] == 0]
    assert top[0]["offset"] == 0
    for a, b in zip(top, top[1:]):
        assert a["offset"] + a["size"] == b["offset"]
    assert top[-1]["offset"] + top[-1]["size"] == len(payload)


def test_largesize_and_to_eof_forms():
    payload = write_mp4_stub(
        1000, 3000, [b"vide"], b"\x01" * 64, largesize_mdat=True
    )
    mdat = next(b for b in parse_mp4_boxes(payload) if b["type"] == "mdat")
    assert mdat["header"] == 16 and mdat["size"] == 16 + 64
    assert mp4_summary(payload)["mdat_bytes"] == 64
    # size==0: box extends to end of file
    free = struct.pack(">I", 0) + b"free" + b"\x07" * 24
    boxes = parse_mp4_boxes(_box(b"ftyp", b"isom" + b"\x00" * 12) + free)
    assert boxes[-1]["type"] == "free"
    assert boxes[-1]["size"] == 8 + 24


def test_corrupt_captures_quarantine():
    good = write_mp4_stub(1000, 2000, [b"vide"], b"x" * 10)
    with pytest.raises(ValueError, match="overflows"):
        parse_mp4_boxes(good[:-6])  # mdat cut short of its claimed size
    with pytest.raises(ValueError, match="truncated box header"):
        parse_mp4_boxes(good + b"\x00\x00\x00")  # stray half-header tail
    # a box claiming more bytes than its parent holds
    bad = struct.pack(">I", 10_000) + b"mdat" + b"\x00" * 8
    with pytest.raises(ValueError, match="overflows"):
        parse_mp4_boxes(bad)
    # size below the header length
    bad = struct.pack(">I", 4) + b"mdat"
    with pytest.raises(ValueError, match="size 4 < header"):
        parse_mp4_boxes(bad)
    # truncated largesize field
    bad = struct.pack(">I", 1) + b"mdat" + b"\x00" * 4
    with pytest.raises(ValueError, match="truncated largesize"):
        parse_mp4_boxes(bad)


# --------------------------------------------------------------------------
# Round-8 sample tables (stts/stss/stsc/stsz/stco)
# --------------------------------------------------------------------------


def test_sample_table_variable_sizes_and_partial_chunk():
    """Variable-size samples across chunks with a partial trailing
    chunk: every sample's recorded byte range point-reads its exact
    payload, keyframes land on the right samples, and chunk math adds
    up."""
    from etl_loading_scripts_spark.llm import mp4

    samples = [bytes([i]) * (5 + 3 * i) for i in range(7)]  # ragged
    p = mp4.write_mp4_indexed(
        1000, 7000, [b"vide", b"soun"], samples,
        samples_per_chunk=3, keyframe_every=2,
    )
    tr = mp4.mp4_sample_tables(p)[0]
    assert tr["handler"] == "vide"
    assert tr["n_samples"] == 7
    assert tr["n_chunks"] == 3  # 3+3+1: partial last chunk
    assert tr["keyframes"] == [1, 3, 5, 7]
    for i in range(7):
        assert mp4.extract_sample(p, tr, i + 1) == samples[i]
    # sizes recorded per sample (stsz uniform escape NOT used)
    assert [s for _o, s in tr["samples"]] == [len(s) for s in samples]
    # second track has no sample table
    assert mp4.mp4_sample_tables(p)[1]["n_samples"] == 0


def test_sample_table_largesize_mdat_offsets():
    """With the 64-bit mdat size escape the chunk offsets shift by the
    extra 8 header bytes — the backpatched stco must still point at the
    true sample bytes."""
    from etl_loading_scripts_spark.llm import mp4

    samples = [b"AAAA", b"BBBBB", b"CC"]
    p = mp4.write_mp4_indexed(
        1000, 300, [b"vide"], samples, samples_per_chunk=2,
        keyframe_every=3, largesize_mdat=True,
    )
    tr = mp4.mp4_sample_tables(p)[0]
    for i, s in enumerate(samples):
        assert mp4.extract_sample(p, tr, i + 1) == s


def test_sample_table_inconsistencies_quarantine():
    """stsz/stts count mismatch and chunk-map/sample-count mismatch
    raise ValueError (quarantine), never a half-right index."""
    import struct

    import pytest

    from etl_loading_scripts_spark.llm import mp4

    samples = [b"xy" * 4] * 4
    p = mp4.write_mp4_indexed(1000, 400, [b"vide"], samples)
    boxes = mp4.parse_mp4_boxes(p)
    stsz = next(b for b in boxes if b["type"] == "stsz")
    bad = bytearray(p)
    # corrupt the stsz sample_count field (offset: header 8 + verflags 4
    # + uniform-size 4)
    struct.pack_into(">I", bad, stsz["offset"] + 16, 99)
    with pytest.raises(ValueError, match="stsz count"):
        mp4.mp4_sample_tables(bytes(bad))
    stsc = next(b for b in boxes if b["type"] == "stsc")
    bad = bytearray(p)
    # corrupt samples_per_chunk of the first stsc run (header 8 +
    # verflags 4 + entry_count 4 + first_chunk 4)
    struct.pack_into(">I", bad, stsc["offset"] + 20, 50)
    with pytest.raises(ValueError, match="chunk map"):
        mp4.mp4_sample_tables(bytes(bad))


def test_sample_table_single_partial_chunk():
    """Fewer samples than samples_per_chunk: one partial chunk whose
    stsc entry records the TRUE count — the writer must not emit a
    chunk map its own parser rejects."""
    from etl_loading_scripts_spark.llm import mp4

    p = mp4.write_mp4_indexed(
        1000, 100, [b"vide"], [b"only-one"], samples_per_chunk=4,
        keyframe_every=3,
    )
    tr = mp4.mp4_sample_tables(p)[0]
    assert tr["n_samples"] == 1 and tr["n_chunks"] == 1
    assert mp4.extract_sample(p, tr, 1) == b"only-one"
