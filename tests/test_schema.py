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
