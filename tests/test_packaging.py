"""Packaging surface: pyproject entry points resolve, the native C++
source ships as package data, and the version is single-sourced."""

import os
import tomllib

import rrin_tpu

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


class TestPackaging:
    def test_console_scripts_resolve(self):
        for target in _project()["scripts"].values():
            mod, fn = target.split(":")
            m = __import__(mod, fromlist=[fn])
            assert callable(getattr(m, fn)), target

    def test_version_single_sourced(self):
        assert _project()["version"] == rrin_tpu.__version__

    def test_native_source_is_package_data(self):
        # The lazy g++ build needs framepack.cpp next to the package.
        assert os.path.exists(
            os.path.join(ROOT, "rrin_tpu", "native", "framepack.cpp")
        )
