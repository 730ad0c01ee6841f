"""Shim for legacy editable installs.

Metadata lives in pyproject.toml. This file exists because offline
environments without the `wheel` package cannot run the PEP-660 editable
build; there, use:

    pip install --no-use-pep517 --no-build-isolation --no-deps -e .

With `wheel` available, plain `pip install -e .` works and ignores this.
"""
from setuptools import setup

setup()
