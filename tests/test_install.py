"""Pin the documented offline install path against THIS environment.

Round-7/8 history: the README claimed editable-install commands that did
not actually run here (pip 23.2.1 + setuptools 65, no `wheel` package —
both `pip install -e .` and `pip install --no-use-pep517 ... -e .` fail).
This test executes the README's command verbatim in a subprocess, proves
`import seafan_spark` works from a cwd far away from the repo root with
PYTHONPATH scrubbed, and uninstalls again — so the install claim cannot
silently rot when packaging tooling shifts underneath it.
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the import must come from the install
    return subprocess.run(
        [sys.executable, *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def _import_away_from_repo(tmp_path):
    return _run(
        ["-c", "import seafan_spark; print(seafan_spark.__file__)"],
        cwd=str(tmp_path),
    )


def test_readme_offline_install_command_works(tmp_path):
    """`python setup.py develop --user --no-deps` (the README command)
    must succeed and make seafan_spark importable from any cwd."""
    pre = _import_away_from_repo(tmp_path)
    if pre.returncode == 0:
        pytest.skip(
            "seafan_spark already installed outside the repo — not "
            "clobbering a pre-existing install to test ours"
        )
    installed = False
    try:
        r = _run(["setup.py", "develop", "--user", "--no-deps"], cwd=REPO)
        assert r.returncode == 0, f"install failed:\n{r.stdout}\n{r.stderr}"
        installed = True
        post = _import_away_from_repo(tmp_path)
        assert post.returncode == 0, (
            f"import after install failed:\n{post.stderr}"
        )
        # the editable install must resolve to THIS tree, not a stale copy
        assert post.stdout.strip() == os.path.join(
            REPO, "seafan_spark", "__init__.py"
        )
    finally:
        if installed:
            u = _run(["setup.py", "develop", "--uninstall", "--user"], cwd=REPO)
            assert u.returncode == 0, f"uninstall failed:\n{u.stderr}"
            gone = _import_away_from_repo(tmp_path)
            assert gone.returncode != 0, "uninstall left the package behind"
