"""Driver-contract regression tests for __graft_entry__.py.

Round 1 shipped a `dryrun_multichip` that crashed when executed the way the
driver executes it (fresh interpreter, `dryrun_multichip(8)` as the first
JAX-touching call): `jax.devices()` initialized the backend before the
`jax_num_cpu_devices` config update, which is illegal post-init. These tests
run the entry points in a FRESH subprocess — not through tests/conftest.py,
which masks the bug by setting the config at import time.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _fresh_run(code: str, timeout: int = 3000):
    # dryrun_multichip now jits THREE engine programs (pjit NT-Xent,
    # pjit modified-loss, explicit shard_map) over 8 virtual devices on
    # this host's single CPU core — ~20-30 min of compile+execute.
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_dryrun_multichip_fresh_interpreter_like_driver():
    # Exactly the driver's invocation shape: import jax, import the module,
    # call dryrun_multichip(8) with no prior backend-initializing work.
    proc = _fresh_run(
        "import jax\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for marker in ("4-step scan ok", "sharded ckpt save/restore ok",
                   "modified-loss step ok", "explicit engine ok"):
        assert f"dryrun_multichip(8): {marker}" in proc.stdout, (
            marker, proc.stdout[-800:], proc.stderr[-1000:])


def test_entry_compiles_fresh_interpreter():
    proc = _fresh_run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "jax.jit(fn).lower(*args).compile()\n"
        "print('entry: ok')\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "entry: ok" in proc.stdout
