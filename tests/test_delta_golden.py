"""Golden-bytes Delta conformance (round 8, VERDICT item 5).

``tests/fixtures/golden_delta`` is a COMMITTED, byte-stable Delta table
(pinned uuids/clock — see tests/_golden_delta_gen.py): the standing
adjudication artifact for the day an independent reader (delta-spark,
duckdb-delta) becomes installable — until then these tests pin both
directions ourselves:

- READ-side: the engine must keep reading the committed bytes exactly
  (backward compatibility with logs already on disk);
- WRITE-side: regenerating the fixture must emit the same actions
  (no silent format drift), with only parquet-internal volatile fields
  (sizes) masked;
- SHAPE-side: the committed bytes themselves must match the open
  protocol document's action grammar.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests._golden_delta_gen import GOLDEN_DIR, PINNED_TIME, generate

PINNED_MS = int(PINNED_TIME * 1000)


def _log_lines(base: str, version: int) -> list[dict]:
    p = os.path.join(base, "_delta_log", f"{version:020d}.json")
    with open(p, "rb") as fh:
        raw = fh.read()
    lines = raw.decode("utf-8").splitlines()
    return [json.loads(l) for l in lines if l]


def test_golden_fixture_reads_exactly(spark):
    """The engine reads the COMMITTED golden bytes: both versions, the
    partition-pruned slice, and the CDC fast path give pinned values."""
    from etl_loading_scripts_spark.operators import deltalog as dl

    v0 = {r.k: r.v for r in dl.read_delta_table(spark, GOLDEN_DIR, version=0).collect()}
    assert v0 == {1: 10, 2: 20, 3: 30, 4: 40}
    v1 = {r.k: r.v for r in dl.read_delta_table(spark, GOLDEN_DIR, version=1).collect()}
    assert v1 == {1: 10, 2: 99, 3: 30, 4: 40, 5: 50}
    m1 = dl.read_delta_table(spark, GOLDEN_DIR, version=1, partition_filter={"m": 1})
    assert {r.k for r in m1.collect()} == {1, 2}
    ch = dl.delta_table_changes(spark, GOLDEN_DIR, 0, 1, on=["k"])
    assert all("_change_data" in f for f in ch.inputFiles())
    got = sorted((r._change_type, r.k, r.v) for r in ch.collect())
    assert got == [("insert", 5, 50), ("update_postimage", 2, 99)]
    # stats-based skipping works off the committed stats
    pruned = dl.read_delta_table(
        spark, GOLDEN_DIR, version=1, stats_filter={"k": (5, None)}
    )
    assert len(pruned.inputFiles()) < len(
        dl.read_delta_table(spark, GOLDEN_DIR, version=1).inputFiles()
    )
    assert {r.k for r in pruned.filter(F.col("k") >= 5).collect()} == {5}
    # v2 (round 9; protocol roaring format since round 10): the
    # deletion-vector commit — data files stay those of v1, the
    # roaring bitmap hides k=3
    v2 = {r.k: r.v for r in dl.read_delta_table(spark, GOLDEN_DIR, version=2).collect()}
    assert v2 == {1: 10, 2: 99, 4: 40, 5: 50}
    act, _, _ = dl._snapshot_state(GOLDEN_DIR, 2)
    dvs = {p: a["deletionVector"] for p, a in act.items() if a.get("deletionVector")}
    assert len(dvs) == 1
    (ref,) = dvs.values()
    assert ref["cardinality"] == 1 and ref["storageType"] == "u"
    assert os.path.isfile(os.path.join(GOLDEN_DIR, dl._dv_file_rel(ref)))


def test_legacy_dv_fixture_still_reads(spark):
    """Backward compatibility pin: the round-9 fixture's LEGACY
    deletion-vector encoding (parquet position sidecar under
    ``_deletion_vectors/``, descriptor {path, cardinality}) keeps
    reading exactly — tables written before the round-10 switch to
    protocol roaring bitmaps must never lose their hidden rows."""
    from etl_loading_scripts_spark.operators import deltalog as dl

    legacy = os.path.join(
        os.path.dirname(__file__), "fixtures", "golden_delta_r9_dv"
    )
    v2 = {r.k: r.v for r in dl.read_delta_table(spark, legacy, version=2).collect()}
    assert v2 == {1: 10, 2: 99, 4: 40, 5: 50}
    act, _, _ = dl._snapshot_state(legacy, 2)
    (ref,) = [
        a["deletionVector"] for a in act.values() if a.get("deletionVector")
    ]
    assert set(ref) == {"path", "cardinality"}
    assert ref["path"].startswith("_deletion_vectors/")
    assert dl._dv_file_rel(ref) == ref["path"]


def _masked(actions: list[dict]) -> list[dict]:
    """Volatile-parquet fields masked: size (codec metadata may differ
    across Spark versions); everything else must match bit-for-bit —
    the pinned clock/uuids make even timestamps and paths comparable."""
    out = []
    for a in actions:
        a = json.loads(json.dumps(a))  # deep copy
        for key in ("add", "cdc"):
            if key in a:
                a[key].pop("size", None)
        out.append(a)
    return out


def test_golden_writer_emits_same_actions(spark, tmp_path):
    """Regenerating with the pinned uuid/clock yields action-identical
    logs — any unintentional writer format drift fails here."""
    fresh = str(tmp_path / "regen")
    generate(spark, fresh)
    for v in (0, 1, 2):
        assert _masked(_log_lines(fresh, v)) == _masked(
            _log_lines(GOLDEN_DIR, v)
        ), f"writer drift at version {v}"


def test_golden_bytes_conform_to_protocol_shapes():
    """The committed bytes against the open protocol document: one
    compact-JSON action per line, %020d file names, the exact field
    sets of protocol/metaData/add/remove actions, relative POSIX
    paths, valid stats JSON, pinned clock everywhere."""
    log_dir = os.path.join(GOLDEN_DIR, "_delta_log")
    names = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))
    assert names == [
        "00000000000000000000.json",
        "00000000000000000001.json",
        "00000000000000000002.json",
    ]

    v0 = _log_lines(GOLDEN_DIR, 0)
    info = v0[0]["commitInfo"]
    assert info["timestamp"] == PINNED_MS
    assert info["operation"] == "CREATE TABLE AS SELECT"
    assert info["engineInfo"] == "etl-loading-scripts-spark"
    assert v0[1] == {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    meta = v0[2]["metaData"]
    assert set(meta) == {
        "id", "format", "schemaString", "partitionColumns",
        "configuration", "createdTime",
    }
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == ["m"]
    assert meta["createdTime"] == PINNED_MS
    schema = json.loads(meta["schemaString"])  # Spark schema JSON form
    assert schema["type"] == "struct"
    assert [f["name"] for f in schema["fields"]] == ["k", "v", "m"]

    all_actions = v0 + _log_lines(GOLDEN_DIR, 1) + _log_lines(GOLDEN_DIR, 2)
    adds = [a["add"] for a in all_actions if "add" in a]
    assert adds, "no add actions in golden log"
    dv_adds = 0
    for add in adds:
        assert set(add) <= {
            "path", "partitionValues", "size", "modificationTime",
            "dataChange", "stats", "deletionVector",
        } and set(add) >= {
            "path", "partitionValues", "size", "modificationTime",
            "dataChange", "stats",
        }
        assert not add["path"].startswith("/") and ".." not in add["path"]
        assert "\\" not in add["path"]  # POSIX separators only
        assert add["partitionValues"] == {"m": add["path"].split("=")[1][0]}
        assert add["modificationTime"] == PINNED_MS
        st = json.loads(add["stats"])
        assert set(st) == {"numRecords", "minValues", "maxValues"}
        assert st["numRecords"] >= 1
        assert set(st["minValues"]) == set(st["maxValues"]) == {"k", "v"}
        if add.get("deletionVector"):
            dv_adds += 1
            dv = add["deletionVector"]
            # the protocol's DV descriptor field set, exactly
            assert set(dv) == {
                "storageType", "pathOrInlineDv", "offset",
                "sizeInBytes", "cardinality",
            }
            assert dv["storageType"] == "u"
            assert len(dv["pathOrInlineDv"]) == 20  # z85 uuid, no prefix
            assert dv["cardinality"] >= 1
            # the referenced .bin exists, carries the version-1 byte,
            # frames the blob at the recorded offset with a valid
            # CRC-32, and the blob is a roaring bitmap array of
            # exactly `cardinality` positions
            from etl_loading_scripts_spark.operators import (
                deltalog as dl,
                roaring as R,
            )

            rel = dl._dv_file_rel(dv)
            assert rel == (
                f"deletion_vector_{R.decode_dv_uuid(dv['pathOrInlineDv'])}.bin"
            )
            with open(os.path.join(GOLDEN_DIR, rel), "rb") as fh:
                buf = fh.read()
            assert buf[0] == R.DV_FILE_VERSION
            blob = R.unpack_dv_blob(buf, dv["offset"], dv["sizeInBytes"])
            assert len(R.deserialize_rbm64(blob)) == dv["cardinality"]
    assert dv_adds == 1  # the DV commit pins the descriptor shape
    removes = [a["remove"] for a in all_actions if "remove" in a]
    for rm in removes:
        assert set(rm) == {"path", "deletionTimestamp", "dataChange"}
        assert rm["deletionTimestamp"] == PINNED_MS
    # the DV commit bumps the protocol: a DV-unaware reader must be
    # turned away rather than resurrect deleted rows
    v2_protos = [
        a["protocol"] for a in _log_lines(GOLDEN_DIR, 2) if "protocol" in a
    ]
    assert v2_protos == [{"minReaderVersion": 3, "minWriterVersion": 3}]
    # every line is COMPACT json (no spaces after separators): the
    # canonical bytes a minimal independent reader would expect
    for v in (0, 1, 2):
        p = os.path.join(log_dir, f"{v:020d}.json")
        for line in open(p, "rb").read().decode().splitlines():
            if line:
                assert json.dumps(
                    json.loads(line), separators=(",", ":")
                ) == line
