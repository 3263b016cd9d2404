"""CLI surface: single-clip JSON (PR1 contract) and the batch JSONL mode."""

import io
import json
import os
from contextlib import redirect_stdout

import pytest

from avd_tpu import analyze as cli
from tests import fixtures


@pytest.fixture(scope="module", autouse=True)
def oracle_backend():
    os.environ["AVD_BACKEND"] = "oracle"
    yield
    os.environ.pop("AVD_BACKEND", None)


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    fixtures.write_video(str(d / "a.mp4"),
                         fixtures.gradient_clip(n=20, size=96))
    fixtures.write_video(str(d / "b.mp4"),
                         fixtures.solid_clip(n=20, size=96))
    (d / "notes.txt").write_text("not a video")
    return d


def test_single_clip_json(clips):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([str(clips / "a.mp4")])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["ok"] is True
    assert list(out)[:6] == ["ok", "meta", "hints", "video", "audio",
                             "result"]


def test_directory_batch_jsonl(clips):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([str(clips), "--jsonl"])
    assert rc == 0
    lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    # only the two .mp4 files, sorted; notes.txt skipped
    assert [os.path.basename(x["path"]) for x in lines] == ["a.mp4", "b.mp4"]
    for x in lines:
        assert x["response"]["ok"] is True
        assert x["response"]["result"]["label"] in ("real", "ai", "uncertain")


def test_batch_records_failures_and_continues(clips, tmp_path):
    bad = tmp_path / "broken.mp4"
    bad.write_bytes(b"\x00" * 64)  # undecodable
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([str(bad), str(clips / "a.mp4"), "--jsonl"])
    lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    assert len(lines) == 2
    # a broken clip still yields a full neutral-fallback envelope (the
    # reference's analyzer isolation, api.py:118-140) — not an error line
    assert all("response" in x for x in lines)
    assert rc == 0


def test_multiple_inputs_require_jsonl(clips):
    with pytest.raises(SystemExit):
        cli.main([str(clips / "a.mp4"), str(clips / "b.mp4")])


def test_no_files_found(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    assert cli.main([str(empty), "--jsonl"]) == 2
