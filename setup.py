"""Shim for legacy editable installs (`setup.py develop` via pip) on
toolchains without the `wheel` package; all metadata lives in
pyproject.toml (PEP 621, read by setuptools >= 61)."""

from setuptools import setup

setup()
