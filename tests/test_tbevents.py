"""The dependency-free TensorBoard event writer produces valid TFRecords."""

import glob
import struct

from egt_tpu.utils.tbevents import EventWriter, _masked_crc


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload)
            out.append(payload)
    return out


def test_event_file_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, 1)
    w.add_scalar("val_mae", 0.25, 2)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    # version header + 2 scalar events, all with valid masked crc32c
    assert len(records) == 3
    assert b"brain.Event:2" in records[0]
    assert b"loss" in records[1]
    assert b"val_mae" in records[2]
    # simple_value float field of the first scalar decodes to 0.5
    assert struct.pack("<f", 0.5) in records[1]
    assert struct.pack("<f", 0.25) in records[2]


def test_known_crc32c_vectors():
    """crc32c (Castagnoli) against published test vectors."""
    from egt_tpu.utils.tbevents import _crc32c
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
