"""TensorBoard event writer (utils/tensorboard.py): CRC-32C against the
published check values, hand-computed protobuf golden bytes, file
round-trips through the independent parser, and the train-loop tee."""

import json
import struct

from tpu_pillars.utils.logging import JsonlLogger
from tpu_pillars.utils.tensorboard import (
    TeeLogger,
    TensorBoardWriter,
    _event,
    crc32c,
    read_events,
)


def test_crc32c_published_vectors():
    # the CRC-32C (Castagnoli) check value, plus iSCSI spec test vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_event_proto_golden_bytes():
    # Event{wall_time=1.5, step=3, summary{value{tag:"a" simple_value:2.0}}}
    # encoded by the standard protobuf wire rules, worked out by hand
    want = (b"\x09" + struct.pack("<d", 1.5)           # 1: double
            + b"\x10\x03"                              # 2: varint
            + b"\x2a\x0a"                              # 5: Summary, 10 bytes
            + b"\x0a\x08"                              # Summary.value
            + b"\x0a\x01a"                             # Value.tag "a"
            + b"\x15" + struct.pack("<f", 2.0))        # Value.simple_value
    assert _event(1.5, step=3, scalars=(("a", 2.0),)) == want


def test_writer_roundtrip(tmp_path):
    with TensorBoardWriter(str(tmp_path)) as tb:
        tb.add_scalar("loss", 0.5, step=1)
        tb.log("train_step", step=2, loss=0.25, lr=1e-3,
               note="non-numeric fields are skipped", flag=True)
        tb.log("bench", value=3.0)   # no step: auto-counts per event
        tb.log("bench", value=4.0)
        path = tb.path

    events = list(read_events(path))   # parser verifies both CRCs per record
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = [(e["step"], e["scalars"]) for e in events[1:]]
    assert scalars[0] == (1, {"loss": 0.5})
    assert scalars[1][0] == 2
    assert scalars[1][1]["train_step/loss"] == 0.25
    assert abs(scalars[1][1]["train_step/lr"] - 1e-3) < 1e-9
    assert "train_step/note" not in scalars[1][1]
    assert "train_step/flag" not in scalars[1][1]
    assert scalars[2] == (0, {"bench/value": 3.0})
    assert scalars[3] == (1, {"bench/value": 4.0})
    assert all(e["wall_time"] > 0 for e in events)


def test_corruption_detected(tmp_path):
    with TensorBoardWriter(str(tmp_path)) as tb:
        tb.add_scalar("x", 1.0, step=0)
        path = tb.path
    raw = bytearray(open(path, "rb").read())
    raw[-7] ^= 0xFF   # flip a payload byte of the last record
    open(path, "wb").write(bytes(raw))
    try:
        list(read_events(path))
        assert False, "corrupted record not detected"
    except ValueError as e:
        assert "CRC" in str(e)


def test_tee_with_jsonl(tmp_path):
    jl_path = tmp_path / "m.jsonl"
    with TeeLogger(JsonlLogger(str(jl_path)),
                   TensorBoardWriter(str(tmp_path))) as logger:
        logger.log("train_step", step=7, loss=1.25)
        tb_path = logger.sinks[1].path
    rec = json.loads(jl_path.read_text().splitlines()[0])
    assert rec["event"] == "train_step" and rec["loss"] == 1.25
    ev = list(read_events(tb_path))[-1]
    assert ev["step"] == 7 and ev["scalars"]["train_step/loss"] == 1.25
