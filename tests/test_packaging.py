"""Packaging metadata stays in sync with the code.

The reference ships no packaging at all (environment.yml only); this
repo adds a standard pyproject so the framework installs as a wheel
with console scripts (reference usage is ``python run_plnerf.py ...``,
here ``plnerf-train ...`` — MIGRATION.md maps the commands).  This test
pins every [project.scripts] target to an importable callable so a CLI
rename cannot silently break the wheel.
"""
import importlib
import pathlib
import tomllib


def test_console_script_targets_resolve():
    root = pathlib.Path(__file__).resolve().parents[1]
    with open(root / "pyproject.toml", "rb") as f:
        proj = tomllib.load(f)["project"]
    scripts = proj["scripts"]
    assert set(scripts) == {"plnerf-train", "plnerf-vanilla",
                            "plnerf-depth", "plnerf-extract-mesh"}
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_package_data_ships_native_source():
    root = pathlib.Path(__file__).resolve().parents[1]
    with open(root / "pyproject.toml", "rb") as f:
        cfg = tomllib.load(f)
    pkg_data = cfg["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pkg_data["plnerf.mesh"]
    # the file the lazy compiler (plnerf/mesh/marching_cubes.py) expects
    assert (root / "plnerf" / "mesh" / "_marching_cubes.cpp").exists()
