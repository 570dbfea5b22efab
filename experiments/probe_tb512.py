"""512^3 full-alignment timing via the direct traceback engine."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np

from trialign.api import align
from trialign.golden import align_planes_numpy
from trialign.golden.numpy_model import rescore_alignment
from trialign.config import Scoring

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
rng = np.random.default_rng(13)
a, b, c = (rng.integers(0, 4, n).astype(np.uint8) for _ in range(3))

t0 = time.perf_counter()
res = align(a, b, c, return_alignment=True)
cold = time.perf_counter() - t0
print(f"{n}^3 full alignment (cold, incl compiles): {cold:.1f}s score={res.score}", flush=True)

t0 = time.perf_counter()
res = align(a, b, c, return_alignment=True)
warm = time.perf_counter() - t0
print(f"{n}^3 full alignment (warm): {warm:.2f}s", flush=True)

sc = Scoring()
assert rescore_alignment(res.alignment, sc) == res.score
for row, seq in zip(res.alignment, (a, b, c)):
    assert [v for v in row if v != -1] == list(map(int, seq))
print("alignment validity OK (rescore + subsequence)", flush=True)
