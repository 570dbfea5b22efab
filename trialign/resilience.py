"""Failure detection and elastic recovery for long alignments.

The reference has no recovery story at all -- its FSM even parks forever
after `finish` because the 1cyc top has no OUT-state arm
(reference: src/TriAlign_1cyc.v:225-348; SURVEY.md section 5).  Production
runs on preemptible TPU pools need one: the blocked sweep's boundary faces
are a complete intermediate state between blocks (the same property the
reference's y/z SRAMs have, src/TriAlign_1cyc.v:127-140), so the
checkpointed aligner can resume mid-grid.  This module wraps it in a
supervisor that detects failures (device loss, preemption surfacing as
exceptions), reinitializes the backend, and resumes from the last
checkpoint -- the single-host analogue of re-dispatching failed hosts.
"""

from __future__ import annotations

import logging
import time
from typing import Optional, Tuple

from trialign.checkpoint import CheckpointedAligner
from trialign.config import Scoring

log = logging.getLogger("trialign.resilience")


class AlignmentFailed(RuntimeError):
    """Raised when an alignment keeps failing after max_retries recoveries."""


def align_resilient(
    a,
    b,
    c,
    scoring: Scoring = Scoring(),
    ckpt_path: Optional[str] = None,
    every: int = 8,
    max_retries: int = 3,
    backoff_s: float = 1.0,
    cleanup: bool = True,
    **kw,
) -> int:
    """Blocked alignment that survives transient backend failures.

    Runs the checkpointed aligner; on any exception, waits, rebuilds the
    aligner (fresh jit state / device handles) and resumes from the last
    persisted face checkpoint, re-running at most `every` blocks.
    """
    attempts = 0
    last_exc: Optional[BaseException] = None
    runner = CheckpointedAligner(
        a, b, c, scoring, ckpt_path=ckpt_path, every=every, **kw
    )
    ckpt = runner.ckpt_path
    # `max_retries` recoveries = 1 initial attempt + max_retries retries.
    while attempts <= max_retries:
        try:
            score = runner.run(checkpoint=True)
            if cleanup:
                import os

                if os.path.exists(ckpt):
                    os.remove(ckpt)
            return score
        except (KeyboardInterrupt, SystemExit, GeneratorExit):
            # Deliberate interruption/shutdown must not be retried.
            raise
        except Exception as e:  # noqa: BLE001 - device loss is broad
            attempts += 1
            last_exc = e
            log.warning(
                "alignment attempt %d failed at block %d/%d: %s -- resuming "
                "from checkpoint",
                attempts,
                runner.next_idx,
                runner.n_blocks,
                e,
            )
            time.sleep(backoff_s * attempts)
            runner = CheckpointedAligner(
                a, b, c, scoring, ckpt_path=ckpt, every=every, **kw
            )
            runner.resume()
    raise AlignmentFailed(
        f"alignment failed after {max_retries} recoveries"
    ) from last_exc


def progress(runner: CheckpointedAligner) -> Tuple[int, int]:
    """(completed blocks, total blocks) -- the failure-detection heartbeat
    a pool supervisor polls."""
    return runner.next_idx, runner.n_blocks
