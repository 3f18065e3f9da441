"""bench.py watchdog contract: a wedged phase must leave a parseable JSON
line — the raw error when nothing was measured, or the already-measured
partial output annotated with watchdog_error (the driver parses stdout)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


def _run(snippet: str) -> subprocess.CompletedProcess:
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy, sys, types\n"
        "bench = runpy.run_path('bench.py')\n" + snippet
    )
    return subprocess.run([sys.executable, "-c", code], cwd=REPO_ROOT,
                          capture_output=True, text=True, timeout=120)


@pytest.mark.parametrize("with_partial", [False, True])
def test_watchdog_fires_with_parseable_json(with_partial):
    snippet = (
        "done, partial = bench['_arm_watchdog'](1)\n"
        + ("partial['out'] = {'metric': 'm', 'value': 1.5}\n"
           if with_partial else "")
        + "import time; time.sleep(30)\n"
    )
    proc = _run(snippet)
    assert proc.returncode == 2
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    if with_partial:
        assert line["value"] == 1.5 and "watchdog_error" in line
    else:
        assert line["unit"] == "error" and "unresponsive" in line["error"]


def test_watchdog_disarmed_exits_clean():
    proc = _run(
        "done, partial = bench['_arm_watchdog'](1)\n"
        "done.set()\n"
        "import time; time.sleep(2)\n"
        "print('CLEAN')\n"
    )
    assert proc.returncode == 0
    assert "CLEAN" in proc.stdout
