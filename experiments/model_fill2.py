"""Host-side wall-clock model for the mixed-1024 batch: where the swept
lane-slots go after the P_CAP=64 / bucketed-packing change, and A/B of
packer variants that attack the dominant slot-rect loss (problems paying
the full canvas when they use ~half of it).

Model: device time ~ swept canvas cells / RATE + NDISPATCH * PREP_S.
RATE = 21e9 slot/s and PREP_S = 30 ms are the probe_mosaic_phases
measurements; the model RANKS variants, it does not predict absolutes.

Run: JAX_PLATFORMS=cpu python experiments/model_fill2.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import trialign.kernels.chain as CH
import trialign.kernels.mosaic as M

RATE = 21e9
PREP_S = 0.030


def workload(n=1024, lo=128, hi=512, seed=77):
    rng = np.random.default_rng(seed)
    return [
        tuple(rng.integers(0, 4, int(rng.integers(lo, hi + 1))).astype(np.uint8)
              for _ in range(3))
        for _ in range(n)
    ]


def split_routes(trips, g, sop=True):
    # sop=True matches the production default scoring (config.Scoring
    # s3_mode="sop"): A = longest, C = SHORTEST, so canvas tiles are
    # naturally narrow.  The first version of this model used the rtl
    # rotation by mistake and ranked packer variants on a workload the
    # bench never runs (see probe_packab.py for the measured outcome).
    items, tall = [], []
    for i, t in enumerate(trips):
        rt = M._rotate(t, sop)
        if len(rt[1]) + 2 > g.hb or len(rt[2]) + 2 > g.wc:
            tall.append((i, rt))
        else:
            items.append((i, rt))
    return items, tall


def canvas_cost(disp, g):
    planes = 0
    for tiles in disp:
        d = 1 + max(len(a) for t in tiles for (_, (a, b, c)) in t.problems)
        npack = max(len(t.problems) for t in tiles)
        planes += npack * d
    return planes * g.hb * g.wc, len(disp)


def tall_cost(tall, g):
    """Swept cells through the tall classes + residue chain (mirrors
    align_batch_mosaic's by_class routing + _route_residue=chain)."""
    by_class = {si: [] for si in range(len(g.tall_shapes))}
    residue = []
    for i, rt in tall:
        cands = [si for si, (t_hb, t_wc, _) in enumerate(g.tall_shapes)
                 if len(rt[1]) < t_hb and len(rt[2]) < t_wc - 1]
        if cands:
            si = min(cands, key=lambda s: (g.tall_shapes[s][0]
                                           * g.tall_shapes[s][1]))
            by_class[si].append((i, rt))
        else:
            residue.append((i, rt))
    cells = 0
    ndisp = 0
    for si, chainable in by_class.items():
        if not chainable:
            continue
        t_hb, t_wc, _ = g.tall_shapes[si]
        for chain in CH.pack_chains(chainable, max_p=g.ch_p_cap):
            la_max = max(len(rt[0]) for _, rt in chain)
            dd = max(CH.chain_pitch(la_max, t_hb, t_wc),
                     (t_hb + t_wc - 4) // 3 + 1)
            cells += len(chain) * dd * t_hb * t_wc
            ndisp += 1
    if residue:
        hbr = max(len(rt[1]) for _, rt in residue) + 2
        wcr = max(len(rt[2]) for _, rt in residue) + 2
        for chain in CH.pack_chains(residue, max_p=g.ch_p_cap):
            la_max = max(len(rt[0]) for _, rt in chain)
            dd = CH.chain_pitch(la_max, hbr, wcr)
            cells += len(chain) * dd * hbr * wcr
            ndisp += 1
    return cells, ndisp, len(residue)


def main():
    trips = workload()
    true_cells = sum(len(a) * len(b) * len(c) for a, b, c in trips)
    g = M.current_geometry()
    items, tall = split_routes(trips, g)
    tc, nd_t, nres = tall_cost(tall, g)
    print(f"canvas-eligible {len(items)}, tall {len(tall)} "
          f"({nres} residue), true {true_cells/1e9:.2f}G cells, "
          f"tall cost fixed at {tc/1e9:.2f}G/{nd_t}d\n")

    def key_lb96(it):
        return (-(len(it[1][1]) // 96), -len(it[1][0]), -len(it[1][1]))

    variants = {
        "PRODUCTION lb-b96,la-desc (no twq)": dict(order_key=None,
                                                   tw_quant=None),
        "lb-b96,la-desc + twq {256,512}": dict(order_key=key_lb96,
                                               tw_quant=(256, 512)),
        "lc-b128,la-desc + twq {256,512}":
            dict(order_key=lambda it: (-(len(it[1][2]) // 128),
                                       -len(it[1][0])),
                 tw_quant=(256, 512)),
        "lc-b128 + twq {128,256,384,512}":
            dict(order_key=lambda it: (-(len(it[1][2]) // 128),
                                       -len(it[1][0])),
                 tw_quant=(128, 256, 384, 512)),
        "lb-b96,lc-b128,la-desc + twq {256,512}":
            dict(order_key=lambda it: (-(len(it[1][1]) // 96),
                                       -(len(it[1][2]) // 128),
                                       -len(it[1][0])),
                 tw_quant=(256, 512)),
        "la-desc only (no twq)": dict(order_key=lambda it: (-len(it[1][0]),),
                                      tw_quant=()),
        "la-desc + twq {256,512}":
            dict(order_key=lambda it: (-len(it[1][0]),),
                 tw_quant=(256, 512)),
    }
    best = None
    for tag, kw in variants.items():
        disp = M.pack_mosaic(items, geom=g, **kw)
        cc, nd_c = canvas_cost(disp, g)
        t = (cc + tc) / RATE + (nd_c + nd_t) * PREP_S
        print(f"{tag:42s} canvas {cc/1e9:6.2f}G/{nd_c:2d}d "
              f"-> model {t:5.2f}s  agg {true_cells/t/1e9:5.2f} GCUPS")
        if best is None or t < best[1]:
            best = (tag, t)
    print(f"\nbest: {best[0]}  ({best[1]:.2f}s modeled)")


if __name__ == "__main__":
    main()
