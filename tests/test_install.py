"""Pin the documented offline install path against THIS environment.

Round-7/8 history: the README claimed editable-install commands that did
not actually run here (pip 23.2.1 + setuptools 65, no `wheel` package —
both `pip install -e .` and `pip install --no-use-pep517 ... -e .` fail).

Two tests (round-9 ADVICE split — the verbatim README command mutates
global user state, so it is opt-in):

- ``test_isolated_install_dir_works`` (always runs): the same setuptools
  ``develop`` machinery into an ISOLATED ``--install-dir`` under
  tmp_path — no global state touched, a hard kill leaves nothing behind
  (pytest tmp dirs are self-cleaning).
- ``test_readme_offline_install_command_works`` (opt-in via
  ``SEAFAN_RUN_INSTALL_TEST=1``): the README's ``--user`` command
  verbatim, import away from the repo with PYTHONPATH scrubbed, then
  uninstall. Opt-in because ``--user`` writes ~/.local
  easy-install.pth: a hard kill between install and the finally-block
  uninstall would leave the repo permanently importable (and this test
  permanently skipping).
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, extra_env=None):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the import must come from the install
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def _import_away_from_repo(tmp_path, extra_env=None):
    return _run(
        ["-c", "import seafan_spark; print(seafan_spark.__file__)"],
        cwd=str(tmp_path),
        extra_env=extra_env,
    )


def test_isolated_install_dir_works(tmp_path):
    """The install machinery must work into an isolated --install-dir
    (no global state: a hard kill leaves only tmp files behind)."""
    dest = tmp_path / "site"
    dest.mkdir()
    r = _run(
        ["setup.py", "develop", "--no-deps", "--install-dir", str(dest)],
        cwd=REPO,
        extra_env={"PYTHONPATH": str(dest)},
    )
    assert r.returncode == 0, f"install failed:\n{r.stdout}\n{r.stderr}"
    # develop --install-dir records the link in an easy-install.pth;
    # .pth files are only processed for SITE dirs, so register the
    # isolated dir as one (what --user gets implicitly via ~/.local)
    post = _run(
        [
            "-c",
            "import site; site.addsitedir(r'%s'); "
            "import seafan_spark; print(seafan_spark.__file__)" % dest,
        ],
        cwd=str(tmp_path),
    )
    assert post.returncode == 0, f"import after install failed:\n{post.stderr}"
    # the editable install must resolve to THIS tree, not a stale copy
    assert post.stdout.strip() == os.path.join(
        REPO, "seafan_spark", "__init__.py"
    )
    # without the isolated dir on the path, nothing leaked globally
    gone = _import_away_from_repo(tmp_path)
    assert gone.returncode != 0, "install leaked outside the isolated dir"


@pytest.mark.skipif(
    os.environ.get("SEAFAN_RUN_INSTALL_TEST") != "1",
    reason="mutates ~/.local (easy-install.pth); opt in with "
    "SEAFAN_RUN_INSTALL_TEST=1",
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
