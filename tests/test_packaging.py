"""Packaging surface: pyproject metadata, console entry points, and the
installed-package native-build site selection (_build.so_site).

The reference ships no packaging either (pip deps only,
/root/reference/requirements.txt); a standalone framework must be
installable, so the wheel carries the detector checkpoints and the C++
host-runtime sources (built lazily by the ctypes loaders).
"""

import importlib
import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve(project):
    for target in project["project"]["scripts"].values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn))


def test_package_data_files_exist(project):
    data = project["tool"]["setuptools"]["package-data"]
    import glob
    for pkg, patterns in data.items():
        base = os.path.join(REPO, *pkg.split("."))
        for pat in patterns:
            assert glob.glob(os.path.join(base, pat), recursive=True), \
                f"package-data glob matches nothing: {pkg}/{pat}"


def test_shipped_checkpoints_in_package_tree():
    # both detector families resolve a shipped checkpoint inside the package
    for fam in ("detector_small", "cnn_small"):
        assert os.path.isdir(
            os.path.join(REPO, "avd_tpu", "models", "weights", fam))


def test_native_sources_in_package_tree():
    src = os.path.join(REPO, "avd_tpu", "native", "src")
    assert os.path.exists(os.path.join(src, "avd_native.cc"))
    assert os.path.exists(os.path.join(src, "avd_decode.cc"))


def test_so_site_dev_checkout():
    _build = importlib.import_module("avd_tpu.native._build")
    # writable src dir (this checkout): build beside the sources
    assert _build.so_site("libavd_native.so") == os.path.join(
        _build.SRC_DIR, "libavd_native.so")


def test_so_site_readonly_install(monkeypatch, tmp_path):
    _build = importlib.import_module("avd_tpu.native._build")
    monkeypatch.setattr(os, "access", lambda p, m: False)
    monkeypatch.setenv("AVD_NATIVE_CACHE", str(tmp_path / "cache"))

    # fresh prebuilt artifact beside the (read-only) sources is honored
    beside = os.path.join(_build.SRC_DIR, "libavd_native.so")
    if os.path.exists(beside):
        assert _build.so_site("libavd_native.so") == beside

    # no artifact → per-user cache dir
    got = _build.so_site("libavd_nosuch.so")
    assert got == str(tmp_path / "cache" / "libavd_nosuch.so")
    assert os.path.isdir(tmp_path / "cache")
