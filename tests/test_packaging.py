"""Packaging surface: pyproject + console entrypoint (reference ships an
installable poetry package, /root/reference/pyproject.toml:2-4)."""
import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_pyproject_parses_and_points_at_entrypoint():
    data = tomllib.loads((REPO / "pyproject.toml").read_text())
    assert data["project"]["name"] == "torchok-tpu"
    assert data["project"]["scripts"]["torchok-tpu"] == \
        "torchok_tpu.__main__:entrypoint"
    # the console entrypoint the script metadata names must exist
    from torchok_tpu.__main__ import entrypoint
    assert callable(entrypoint)


def test_license_is_apache2():
    text = (REPO / "LICENSE").read_text()
    assert "Apache License" in text and "Version 2.0" in text


def test_native_cpp_listed_as_package_data():
    data = tomllib.loads((REPO / "pyproject.toml").read_text())
    assert "*.cpp" in data["tool"]["setuptools"]["package-data"][
        "torchok_tpu.native"]
    assert (REPO / "torchok_tpu" / "native" / "io_kernels.cpp").exists()
