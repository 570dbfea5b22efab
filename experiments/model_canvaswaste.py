"""Round-5: decompose the canvas's slot-rect waste (fill ~0.48 on ~40%
of the mixed-1024 device time) into its mechanisms, per dispatch:

  pitch  -- slot pitch d vs (la+1) per problem
  rows   -- band-run height vs (lb+2) per problem
  lanes  -- canvas width vs sum of tile widths (unoccupied lanes)
  width  -- tile width (set by its first problem) vs (lc+2) of later ones
  npack  -- sweep length npack*d vs each tile's own fill count

Run: JAX_PLATFORMS=cpu python experiments/model_canvaswaste.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import trialign.kernels.chain as CH
import trialign.kernels.mosaic as M
from model_tallfill import split_routes, workload


def main():
    trips = workload()
    g = M.current_geometry()
    items, tall = split_routes(trips, g)
    disp = M.pack_mosaic(items, geom=g)

    true = swept = 0.0
    # accumulate "recoverable" cells per mechanism (independently)
    save = dict(pitch=0.0, rows=0.0, lanes=0.0, width=0.0, npack=0.0)
    for di, tiles in enumerate(disp):
        d = CH.chain_pitch(
            max(len(a) for t in tiles for (_, (a, b, c)) in t.problems),
            g.hb, g.wc)
        npack = max(len(t.problems) for t in tiles)
        plane = g.hb * g.wc
        sw = npack * d * plane
        swept += sw
        used_lanes = sum(t.tw for t in tiles)  # per-band really; coarse
        tr = 0.0
        for t in tiles:
            for m, (oi, (a, b, c)) in enumerate(t.problems):
                la, lb, lc = len(a), len(b), len(c)
                tr += la * lb * lc
                save["pitch"] += (d - la - 1) * (lb + 2) * (lc + 2)
                save["rows"] += d * (t.th - lb - 2) * (lc + 2)
                save["width"] += d * (lb + 2) * (t.tw - lc - 2)
            save["npack"] += (npack - len(t.problems)) * d * t.th * t.tw
        # unoccupied lanes x full sweep (approximate: bands overlap)
        area_tiles = sum(t.th * t.tw for t in tiles)
        save["lanes"] += npack * d * (plane - area_tiles)
        true += tr
        print(f"  d#{di}: ntiles {len(tiles)} npack {npack} d {d} "
              f"tile-fills {[len(t.problems) for t in tiles]} "
              f"tile-rects {[(t.th, t.tw) for t in tiles]}")
    print(f"\ncanvas true {true/1e9:.2f}G / swept {swept/1e9:.2f}G "
          f"-> fill {true/swept:.3f}")
    for k, v in sorted(save.items(), key=lambda kv: -kv[1]):
        print(f"  {k:6s} recoverable ~{v/1e9:6.2f}G  ({v/swept*100:5.1f}% "
              "of swept)")


if __name__ == "__main__":
    main()
