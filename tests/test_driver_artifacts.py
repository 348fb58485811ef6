"""Wall-clock guard on the EXACT driver invocations.

Round 3's multi-chip artifact went red (``MULTICHIP_r03.json`` rc=124,
empty tail) because ``dryrun_multichip``'s default config was upgraded past
the driver's timeout and no test measured the real driver command. These
tests shell out to ``scripts/check_driver_artifacts.py`` so the exact
subprocess the driver runs — same env, same default args — is bounded by an
explicit budget on every suite run. A future "upgrade" that slows a driver
entry now fails HERE, visibly, instead of in the end-of-round artifact.

These are the slowest tests in the suite by design (~4 min total on the
1-CPU driver host): they are the only evidence the driver records.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "check_driver_artifacts.py")


def _run(only: str) -> None:
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--only", only],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"driver artifact check '{only}' failed (would ship a red "
        f"end-of-round artifact):\n{proc.stdout[-3000:]}"
    )


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation_within_budget():
    # The MULTICHIP artifact: JAX_PLATFORMS=cpu, 8 virtual devices,
    # dryrun_multichip(8) with DEFAULT args — exactly what the driver runs.
    _run("dryrun")


@pytest.mark.slow
def test_bench_smoke_within_budget():
    _run("bench")


@pytest.mark.slow
def test_entry_single_device_within_budget():
    _run("entry")
