"""Setuptools shim: metadata lives in pyproject.toml. This file exists so
`pip install -e .` works on environments whose setuptools predates
bundled wheel support (the legacy develop path needs a setup.py)."""

from setuptools import setup

setup()
