"""Round-3 probe: single-alignment 512^3 block-shape sweep (VERDICT r2
item 2: one alignment including ramp must beat the ASIC's 10.82 ms).

Candidates (homo blocked sweep, chained x8 distinct-A for timing):
  (264, 640, 24)  round-2 probe shape: 2 j-blocks, 118 macros/block
  (520, 640, 8)   single block, no faces at all, 42.6 MB VMEM (< cliff)
  (520, 512, 8)   single j-block, 2 k-blocks
  (520, 384, 16)  single j-block, 2 k-blocks, bigger macro
  (136, 384, 24)  the default planner pick under the 13 MB budget
Run: python experiments/probe_single512.py
"""

import time

import numpy as np


def main():
    import jax

    from trialign import benchmarks as B
    from trialign.config import Scoring

    scoring = Scoring()
    print(f"backend={jax.default_backend()}", flush=True)
    shapes = [
        (264, 640, 24),
        (520, 640, 8),
        (520, 512, 8),
        (520, 384, 16),
        None,  # planner default
    ]
    for shape in shapes:
        label = str(shape) if shape else "planner-default"
        try:
            t0 = time.perf_counter()
            g, dt = B.bench_blocked(512, 8, scoring, block_shape=shape)
            wall = time.perf_counter() - t0
            print(f"{label}: {dt*1e3:.2f} ms/alignment ({g:.2f} GCUPS) "
                  f"[stage wall {wall:.0f}s]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
