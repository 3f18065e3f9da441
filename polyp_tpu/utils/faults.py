"""Deterministic fault injection for crash-resume testing.

The reference's only recovery story is filesystem-state probing after a
SLURM walltime kill (SURVEY §5 failure-detection row); this build's
epoch-level resume (train/resume.py) is verified end-to-end by killing a
real training CLI mid-run and asserting the restarted run matches an
uninterrupted one. The kill has to be abrupt (no finally blocks, no
buffered-file flushes) and land at a reproducible point — so the trainer
loops call `maybe_crash("epoch", n)` right after each snapshot, and the
test arms it via the environment:

    POLYP_TPU_CRASH_AT="epoch:1"   # SIGKILL self after epoch 1's snapshot

Unset (production), the probe is a single dict lookup.
"""

from __future__ import annotations

import os
import signal

ENV_VAR = "POLYP_TPU_CRASH_AT"


def maybe_crash(point: str, index: int) -> None:
    """SIGKILL the process when `POLYP_TPU_CRASH_AT == f"{point}:{index}"`.

    SIGKILL (not sys.exit) so nothing downstream of the kill — terminal
    snapshots, artifact uploads, tracker flushes — can run: the honest
    crash model."""
    spec = os.environ.get(ENV_VAR)
    if not spec:
        return
    want_point, _, want_index = spec.rpartition(":")
    if want_point == point and want_index == str(index):
        os.kill(os.getpid(), signal.SIGKILL)
