"""Round-5 probe: single-sweep 1k^3 block-shape sweep (VERDICT r4 item 3:
the headline sits at 75.5% of roofline; find the shape floor at 1k or
prove it, with the 512-probe's rigor).

Run AFTER the round-5 ramp/steady kernel split lands: the steady phase
drops ~8 structural plane-ops, which shifts both the absolute numbers
and the optimal shape (tall pillars shorten the ramp fraction
(tb+tc)/qqb, which is now the EXPENSIVE phase).

Candidates (homo blocked sweep, x4 distinct for timing):
  planner default  (choose_block_shape under the 13 MB budget)
  (264, 640, 24)   round-2 512 winner geometry
  (520, 640, 8)    2 j-blocks x 2 k-blocks, max plane, 42.6 MB
  (520, 512, 8)    2 x 3 blocks
  (520, 384, 16)   chain-protocol shape
  (344, 512, 16)   3 x 3, mid plane, bigger macro
  (264, 512, 16)   4 x 3 (near planner)
Run: python experiments/probe_single1k.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from trialign import benchmarks as B
    from trialign.config import Scoring

    scoring = Scoring()
    print(f"backend={jax.default_backend()}", flush=True)
    shapes = [
        None,  # planner default (176, 384, 8) under the 3.5-stack model
        (152, 384, 16),  # the pre-split planner pick (explicit vmem limit)
        (264, 640, 24),
        (520, 512, 8),
        (520, 384, 16),
        (344, 512, 16),
        (264, 512, 16),
        (176, 512, 8),
    ]
    for shape in shapes:
        label = str(shape) if shape else "planner-default"
        try:
            t0 = time.perf_counter()
            g, dt = B.bench_blocked(1024, 4, scoring, block_shape=shape)
            wall = time.perf_counter() - t0
            print(f"{label}: {dt*1e3:.2f} ms/alignment ({g:.2f} GCUPS) "
                  f"[stage wall {wall:.0f}s]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
