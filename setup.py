"""Shim for legacy editable installs.

Metadata lives in pyproject.toml. This file exists because offline
environments without the `wheel` package cannot run the PEP-660 editable
build (pip's --no-use-pep517 escape hatch ALSO requires wheel); there,
the verified offline path is setuptools' own develop command:

    python setup.py develop --user --no-deps
    # undo: python setup.py develop --uninstall --user

(pinned by tests/test_install.py against this exact environment).
With `wheel` available, plain `pip install -e .` works and ignores this.
"""
from setuptools import setup

setup()
