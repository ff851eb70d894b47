"""Packaging: the engine is an installable distribution, not a
sys.path trick. Verifies (a) the PEP 621 metadata builds a valid sdist,
(b) an editable install lands the package and its console scripts in an
isolated target (this container lacks the `wheel` package, so the
legacy `setup.py develop` path stands in for `pip install -e .` —
byte-identical egg-link semantics), and (c) every [project.scripts]
entry point resolves to a real callable."""

import os
import subprocess
import sys
import tarfile
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sdist_builds_with_package_and_tools(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import setuptools.build_meta as b, sys; print(b.build_sdist(sys.argv[1]))",
            str(tmp_path),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    sdists = [f for f in os.listdir(tmp_path) if f.endswith(".tar.gz")]
    assert len(sdists) == 1
    with tarfile.open(tmp_path / sdists[0]) as tf:
        names = tf.getnames()
        root = names[0].split("/")[0]
        for member in (
            "pyproject.toml",
            "sneldb_spark/__init__.py",
            "sneldb_spark/engine.py",
            "sneldb_spark/tools/soak.py",
            "sneldb_spark/store/event_store.py",
        ):
            assert f"{root}/{member}" in names, f"sdist missing {member}"
        pkg_info = tf.extractfile(f"{root}/PKG-INFO").read().decode()
    assert "Name: sneldb-spark" in pkg_info
    assert "Version: " in pkg_info
    # dependency pins ride in the sdist (requires.txt on this setuptools
    # vintage; newer ones put Requires-Dist straight into PKG-INFO)
    requires = [n for n in names if n.endswith("requires.txt")]
    if "Requires-Dist: pyspark" not in pkg_info:
        assert requires, "no dependency metadata in the sdist"


def test_console_script_entry_points_resolve():
    import importlib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert set(scripts) >= {
        "sneldb-cli",
        "sneldb-server",
        "sneldb-stress",
        "sneldb-soak",
        "sneldb-wal-archive",
        "sneldb-inspect",
    }
    for name, target in scripts.items():
        mod, _, attr = target.partition(":")
        fn = getattr(importlib.import_module(mod), attr)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_editable_install_into_isolated_target(tmp_path):
    """setup.py develop into a private site dir: the installed package
    must be importable from there and the generated console scripts must
    run (--help exits 0)."""
    site = tmp_path / "site"
    bindir = site / "bin"
    site.mkdir()
    # a plain PYTHONPATH dir does not process .pth files; this shim makes
    # the isolated dir behave like the site-packages a real pip install
    # targets (python auto-imports sitecustomize from sys.path)
    (site / "sitecustomize.py").write_text(
        "import os, site; site.addsitedir(os.path.dirname(os.path.abspath(__file__)))\n"
    )
    env = {**os.environ, "PYTHONPATH": str(site)}
    out = subprocess.run(
        [
            sys.executable,
            "setup.py",
            "develop",
            "--no-deps",
            "--install-dir",
            str(site),
            "--script-dir",
            str(bindir),
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert (bindir / "sneldb-cli").exists()
    assert (bindir / "sneldb-server").exists()
    # import resolves through the egg-link, not the cwd
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sneldb_spark, os; print(os.path.dirname(sneldb_spark.__file__))",
        ],
        cwd=str(tmp_path),  # NOT the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert probe.returncode == 0, probe.stderr[-1000:]
    assert probe.stdout.strip() == os.path.join(REPO, "sneldb_spark")
    helped = subprocess.run(
        [sys.executable, str(bindir / "sneldb-cli"), "--help"],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert helped.returncode == 0, helped.stderr[-1000:]
    assert "sneldb-cli" in helped.stdout
