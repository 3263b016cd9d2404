"""Response schema validation against real pipeline output."""

import os

import pytest

from avd_tpu import config as config_mod, schema
from tests import fixtures


@pytest.fixture(autouse=True)
def oracle_backend():
    os.environ["AVD_BACKEND"] = "oracle"
    config_mod.reset_config()
    yield
    os.environ.pop("AVD_BACKEND", None)
    config_mod.reset_config()


def test_pipeline_output_validates(tmp_path):
    from avd_tpu import pipeline
    path = fixtures.write_video(tmp_path / "v.mp4",
                                fixtures.spliced_clip(60, 64), fps=30.0)
    out = pipeline.analyze_path(path)
    schema.validate(out)  # must not raise
    r = schema.to_result(out)
    assert r.label in schema.LABELS


def test_wav_input_validates(tmp_path):
    """Audio-only input: video neutral/empty, audio analyzed."""
    from avd_tpu import pipeline
    path = fixtures.write_wav(tmp_path / "a.wav", fixtures.speechy_wav(4.0))
    out = pipeline.analyze_path(path)
    schema.validate(out)
    assert out["audio"]["scores"], "audio features must be real for WAV"
    assert "error" not in out["audio"]["flags_audio"]
    # video cannot decode a wav → neutral/empty contract
    assert out["video"]["timeline"] in ([], [0.5] * len(
        out["video"]["timeline"]))


def test_validator_rejects_bad_shapes():
    with pytest.raises(schema.SchemaError):
        schema.validate({"ok": True})
    good_like = {
        "ok": True,
        "meta": {k: None for k in schema.META_KEYS},
        "hints": {},
        "video": {"timeline": [], "summary": {}, "timeline_ai": []},
        "audio": {"scores": {}, "flags_audio": {}, "timeline": []},
        "result": {"label": "maybe", "ai_score": 0.5, "confidence": 0.5,
                   "reason": "x"},
        "timeline_binned": [],
        "peaks": [],
    }
    with pytest.raises(schema.SchemaError):
        schema.validate(good_like)  # bad label
    good_like["result"]["label"] = "real"
    good_like["result"]["ai_score"] = 0.123  # not 2dp
    with pytest.raises(schema.SchemaError):
        schema.validate(good_like)


def _minimal_valid():
    return {
        "ok": True,
        "meta": {k: None for k in schema.META_KEYS},
        "hints": {},
        "video": {"timeline": [], "summary": {}, "timeline_ai": []},
        "audio": {"scores": {}, "flags_audio": {}, "timeline": []},
        "result": {"label": "real", "ai_score": 0.5, "confidence": 0.5,
                   "reason": "x"},
        "timeline_binned": [0.5],
        "peaks": [],
    }


def test_malformed_types_raise_schema_error_not_type_error():
    """Wrong-typed fields must surface as SchemaError (and is_valid must
    return False), never bare TypeError/AttributeError."""
    cases = []
    r = _minimal_valid()
    r["result"]["ai_score"] = "0.72"  # round(str, 2) → TypeError
    cases.append(r)
    r = _minimal_valid()
    r["timeline_binned"] = [0.5, None]  # 0.0 <= None → TypeError
    cases.append(r)
    r = _minimal_valid()
    r["meta"] = None  # .keys() → AttributeError
    cases.append(r)
    r = _minimal_valid()
    del r["result"]["reason"]  # missing key
    cases.append(r)
    for resp in cases:
        with pytest.raises(schema.SchemaError):
            schema.validate(resp)
        assert schema.is_valid(resp) is False


def test_empty_timeline_and_dangling_peaks_rejected():
    """The reference's fused timeline is never empty (fusion.py:19), and
    every peak must index a real bin."""
    r = _minimal_valid()
    r["timeline_binned"] = []
    assert not schema.is_valid(r)
    r = _minimal_valid()
    r["timeline_binned"] = []
    r["peaks"] = [0]
    assert not schema.is_valid(r)
    r = _minimal_valid()
    r["peaks"] = [1]  # one bin → only index 0 valid
    assert not schema.is_valid(r)
    assert schema.is_valid(_minimal_valid())
