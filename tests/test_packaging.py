"""Packaging contract: pyproject.toml metadata stays consistent with the
tree (entry point resolves, the main.py shim re-exports the CLI, declared
required dependencies actually exist in this environment)."""

import importlib
import os
import sys
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# canonical import name of required deps whose PyPI name differs
_IMPORT_NAME = {"pillow": "PIL", "pyyaml": "yaml"}


def _load_pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_entry_point_resolves_to_cli_main():
    proj = _load_pyproject()["project"]
    target = proj["scripts"]["fsodtf"]
    mod_name, func_name = target.split(":")
    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))


def test_main_shim_reexports_cli():
    sys.path.insert(0, REPO)
    try:
        import main as shim
    finally:
        sys.path.remove(REPO)
    from fewshotobjectdetection_imporove_via_text_feature_tpu import cli

    for name in (
        "main",
        "setup",
        "do_test",
        "build_evaluator",
        "default_argument_parser",
        "resolve_eval_iter_checkpoint",
    ):
        assert getattr(shim, name) is getattr(cli, name), name


def test_required_dependencies_importable():
    proj = _load_pyproject()["project"]
    for req in proj["dependencies"]:
        dist = (
            req.split(">=")[0].split("==")[0].split("<")[0].strip()
        )
        importlib.import_module(_IMPORT_NAME.get(dist, dist))


def test_package_discovery_includes_all_subpackages():
    """Every top-level importable package in the repo root must be matched
    by the discovery glob, or it would silently ship missing from wheels
    (tests/ and tools/ are intentionally not distributed)."""
    proj = _load_pyproject()
    include = proj["tool"]["setuptools"]["packages"]["find"]["include"]
    assert include == ["fewshotobjectdetection_imporove_via_text_feature_tpu*"]
    undistributed = {"tests", "tools"}
    for entry in sorted(os.listdir(REPO)):
        d = os.path.join(REPO, entry)
        if not os.path.isfile(os.path.join(d, "__init__.py")):
            continue
        if entry in undistributed:
            continue
        assert entry.startswith(
            "fewshotobjectdetection_imporove_via_text_feature_tpu"
        ), f"top-level package {entry!r} is not covered by the include glob"
