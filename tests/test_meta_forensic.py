"""Forensic/meta analyzer tests: BMFF scanning, C2PA detection, summary
shape (/root/reference/app/analyzers/meta.py, forensic.py)."""

import struct

import numpy as np

from avd_tpu.analyzers import forensic, meta
from avd_tpu.ingest import bmff
from tests import fixtures


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _udta_text(tag: bytes, text: bytes) -> bytes:
    payload = struct.pack(">HH", len(text), 0) + text
    return _box(tag, payload)


def test_bmff_scan_udta_make_model(tmp_path):
    udta = _box(b"udta", _udta_text(b"\xa9mak", b"Apple")
                + _udta_text(b"\xa9mod", b"iPhone 15 Pro"))
    moov = _box(b"moov", udta)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x00\x01isom")
    p = tmp_path / "m.mp4"
    p.write_bytes(ftyp + moov)
    scan = bmff.scan_file(str(p))
    assert scan["tags"]["QuickTime:Make"] == "Apple"
    assert scan["tags"]["QuickTime:Model"] == "iPhone 15 Pro"
    assert not scan["c2pa_uuid"]


def test_bmff_scan_c2pa_uuid(tmp_path):
    c2pa_uuid = bytes.fromhex("d8fec3d61b0e483c92975828877ec481")
    p = tmp_path / "c.mp4"
    p.write_bytes(_box(b"ftyp", b"isom\x00\x00\x00\x01")
                  + _box(b"uuid", c2pa_uuid + b"\x00" * 8))
    scan = bmff.scan_file(str(p))
    assert scan["c2pa_uuid"]


def test_forensic_summary_shape(tmp_path):
    udta = _box(b"udta", _udta_text(b"\xa9mak", b"Canon"))
    p = tmp_path / "v.mp4"
    p.write_bytes(_box(b"ftyp", b"isom") + _box(b"moov", udta))
    out = meta.forensic_summary(str(p))
    assert set(out.keys()) == {"c2pa", "exif_quick"}
    assert isinstance(out["c2pa"]["present"], bool)
    assert out["exif_quick"].get("QuickTime:Make") == "Canon"


def test_forensic_summary_c2pa_positive(tmp_path):
    c2pa_uuid = bytes.fromhex("d8fec3d61b0e483c92975828877ec481")
    p = tmp_path / "c.mp4"
    p.write_bytes(_box(b"uuid", c2pa_uuid + b"\x00" * 16))
    out = meta.forensic_summary(str(p))
    assert out["c2pa"]["present"] is True


def test_c2pa_substring_heuristic():
    # Reference behavior (meta.py:11-16): substring scan of the record.
    assert meta.c2pa_present({"X": "contains c2pa data"})
    assert meta.c2pa_present({"X": "jumbf box"})
    assert meta.c2pa_present({"m": "manifest", "c": "claim"})
    assert not meta.c2pa_present({"X": "plain video"})


def test_detect_device_priority():
    assert meta.detect_device({"EXIF:Make": "Sony",
                               "QuickTime:Make": "Apple"}) == "Apple"
    assert meta.detect_device({}) is None


def test_dead_forensic_module_shape(tmp_path):
    """forensic.analyze keeps the reference's dead-module contract
    (forensic.py:27-32)."""
    p = tmp_path / "v.mp4"
    p.write_bytes(_box(b"ftyp", b"isom"))
    out = forensic.analyze(str(p))
    assert set(out.keys()) == {"exif", "c2pa"}
    assert "has_data" in out["exif"] and "subset" in out["exif"]


def test_scan_garbage_file(tmp_path):
    p = tmp_path / "g.bin"
    p.write_bytes(np.random.default_rng(0).bytes(4096))
    scan = bmff.scan_file(str(p))  # must not raise
    assert isinstance(scan["box_types"], list)


def test_real_cv2_mp4_scans(tmp_path):
    clip = fixtures.solid_clip(10, 64)
    path = fixtures.write_video(tmp_path / "s.mp4", clip)
    scan = bmff.scan_file(path)
    assert "moov" in scan["box_types"]
    out = meta.forensic_summary(path)
    assert out["c2pa"]["present"] is False
