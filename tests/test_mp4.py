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
