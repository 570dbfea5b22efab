"""Round-5 fill model: attack the TALL-class slot-rect loss (60% of
device time on the mixed-1024 bench, probe_packab) by routing tall
problems through MOSAIC canvases (k-tiled single-band geometries) so two
narrow-|C| problems share a slot plane, and model a canvas npack-
rebalance post-pass.

Model: device time ~ swept cells / RATE + ndisp * PREP_S (RATE 21e9
slots/s, PREP_S 30 ms, both probe_mosaic_phases).  Same-kernel variants
rank reliably; hetero-chain vs mosaic share CH._hetero_core (mosaic adds
nb=6 static bands vs the tall classes' nb=4, ~5%/band band-select tax --
charged below).  The model RANKS; bench measures.

VMEM gate (the ~55 MB spill cliff, choose_chain_shape's model, worst
case 4*unb stack temporaries): geometries over 50 MB are flagged.

Run: JAX_PLATFORMS=cpu python experiments/model_tallfill.py
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
BAND_TAX = 0.05  # per static band (choose_chain_shape's coefficient)


def workload(n=1024, lo=128, hi=512, seed=77):
    rng = np.random.default_rng(seed)
    return [
        tuple(rng.integers(0, 4, int(rng.integers(lo, hi + 1))).astype(np.uint8)
              for _ in range(3))
        for _ in range(n)
    ]


def split_routes(trips, g):
    items, tall = [], []
    for i, t in enumerate(trips):
        rt = M._rotate(t, True)
        if len(rt[1]) + 2 > g.hb or len(rt[2]) + 2 > g.wc:
            tall.append((i, rt))
        else:
            items.append((i, rt))
    return items, tall


def canvas_cost(disp, g, nb=6):
    planes = 0
    for tiles in disp:
        d = CH.chain_pitch(
            max(len(a) for t in tiles for (_, (a, b, c)) in t.problems),
            g.hb, g.wc)
        npack = max(len(t.problems) for t in tiles)
        planes += npack * d
    return planes * g.hb * g.wc * (1 + BAND_TAX * nb), len(disp)


def vmem_mb(hb, wc, unb, nb):
    nbr = nb + 3
    return ((4 * unb + 17 + 2 * nbr + 5) * hb * wc + 2 * (hb + 8) * wc) * 4 / 2**20


def tall_cost_hetero(tall, g):
    """Production: hetero chain classes + residue chain (as today)."""
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
            cells += len(chain) * dd * t_hb * t_wc * (1 + BAND_TAX * 4)
            ndisp += 1
    return cells, ndisp, residue


def residue_cost(residue):
    if not residue:
        return 0.0, 0
    hbr = max(len(rt[1]) for _, rt in residue) + 2
    wcr = max(len(rt[2]) for _, rt in residue) + 2
    cells = 0
    ndisp = 0
    for chain in CH.pack_chains(residue, max_p=64):
        la_max = max(len(rt[0]) for _, rt in chain)
        dd = CH.chain_pitch(la_max, hbr, wcr)
        cells += len(chain) * dd * hbr * wcr * (1 + BAND_TAX * 6)
        ndisp += 1
    return cells, ndisp


def tall_cost_mosaic(tall, geoms):
    """Tall problems routed to the SMALLEST-plane mosaic geometry that
    fits (single-band canvases from ``geoms``), packed by pack_mosaic;
    non-fitting problems go to the residue chain."""
    by_geom = {gi: [] for gi in range(len(geoms))}
    residue = []
    for i, rt in tall:
        cands = [gi for gi, tg in enumerate(geoms)
                 if len(rt[1]) + 2 <= tg.hb and len(rt[2]) + 2 <= tg.wc]
        if cands:
            gi = min(cands, key=lambda x: geoms[x].hb * geoms[x].wc)
            by_geom[gi].append((i, rt))
        else:
            residue.append((i, rt))
    cells = 0.0
    ndisp = 0
    for gi, probs in by_geom.items():
        if not probs:
            continue
        tg = geoms[gi]
        disp = M.pack_mosaic(probs, geom=tg)
        c, nd = canvas_cost(disp, tg, nb=6)
        cells += c
        ndisp += nd
    return cells, ndisp, residue


def rebalance(dispatches, g, npack_cap=None):
    """Post-pass: move problems out of the fullest tiles into emptier
    compatible tiles of the same dispatch until npack stops dropping."""
    npack_cap = npack_cap or g.p_cap
    moved = 0
    for disp in dispatches:
        while True:
            fills = [len(t.problems) for t in disp]
            npack = max(fills)
            donors = [t for t in disp if len(t.problems) == npack]
            # every max-fill tile must shed one problem to cut npack
            ok = True
            staged = []
            for t in donors:
                found = False
                for item in list(t.problems):
                    _, (a, b, c) = item
                    lb, lc = len(b), len(c)
                    for t2 in disp:
                        if (t2 is not t and len(t2.problems) < npack - 1
                                and t2.fits(lb, lc)):
                            staged.append((t, item, t2, (lb, lc)))
                            found = True
                            break
                    if found:
                        break
                if not found:
                    ok = False
                    break
            if not ok or not staged:
                break
            for t, item, t2, cell in staged:
                t.problems.remove(item)
                t.cells.discard(cell)
                t2.problems.append(item)
                t2.cells.add(cell)
                moved += 1
    return moved


def main():
    trips = workload()
    true_cells = sum(len(a) * len(b) * len(c) for a, b, c in trips)
    g = M.current_geometry()
    items, tall = split_routes(trips, g)

    # Canvas baseline + rebalance A/B
    disp = M.pack_mosaic(items, geom=g)
    cc0, ndc = canvas_cost(disp, g)
    moved = rebalance(disp, g)
    cc1, _ = canvas_cost(disp, g)
    print(f"canvas {len(items)} problems: {cc0/1e9:.2f}G cells/{ndc}d; "
          f"rebalance moved {moved} -> {cc1/1e9:.2f}G "
          f"({(cc1-cc0)/cc0*100:+.1f}%)\n")

    # Tall variants
    th, nd_h, res_h = tall_cost_hetero(tall, g)
    rc_h, nd_rh = residue_cost(res_h)
    print(f"tall {len(tall)} problems ({len(res_h)} residue):")
    print(f"  A) production hetero classes : {th/1e9:6.2f}G/{nd_h}d "
          f"+ residue {rc_h/1e9:.2f}G/{nd_rh}d")

    def TG(hb, wc, nt=4, unb=8):
        return M.CanvasGeometry(hb=hb, wc=wc, bands=(hb,), nt_max=nt,
                                p_cap=g.ch_p_cap, unb=unb)

    variants = {
        "B) mosaic (456,384)+(520,256)": [TG(456, 384), TG(520, 256)],
        "C) mosaic (456,512)+(520,256)": [TG(456, 512), TG(520, 256)],
        "D) mosaic (520,384) single":    [TG(520, 384)],
        "E) mosaic (520,512) single":    [TG(520, 512)],
        "F) mosaic (456,512)+(520,384)": [TG(456, 512), TG(520, 384)],
        "G) mosaic (456,384)+(520,384)": [TG(456, 384), TG(520, 384)],
    }
    base_total = (cc0 + th + rc_h) / RATE + (ndc + nd_h + nd_rh) * PREP_S
    print(f"\n  baseline total {base_total:.2f}s "
          f"-> {true_cells/base_total/1e9:.2f} GCUPS modeled\n")
    for tag, geoms in variants.items():
        tm, nd_m, res_m = tall_cost_mosaic(tall, geoms)
        rc, nd_r = residue_cost(res_m)
        t = (cc1 + tm + rc) / RATE + (ndc + nd_m + nd_r) * PREP_S
        vm = ", ".join(f"{vmem_mb(tg.hb, tg.wc, tg.unb, 6):.0f}MB"
                       for tg in geoms)
        flag = " OVER-VMEM" if any(
            vmem_mb(tg.hb, tg.wc, tg.unb, 6) > 50 for tg in geoms) else ""
        print(f"  {tag}: {tm/1e9:6.2f}G/{nd_m}d + res {rc/1e9:.2f}G/{nd_r}d"
              f" -> total {t:.2f}s  {true_cells/t/1e9:5.2f} GCUPS"
              f"  [vmem {vm}]{flag}")


if __name__ == "__main__":
    main()
