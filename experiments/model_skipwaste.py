"""Host-side model: how much of the mixed-batch wall time is SKIPPED-macro
overhead, and what a static-qqb ladder would recover.

Uses the exact bench_batch_mixed workload (seed 77, 1024 triplets,
len 128-512), the production packers (pack_mosaic / pack_chains), and the
probe_skipmacro cost fit (active ~73.6 us/macro, skipped ~32.5 us/macro at
(328,512); scaled by plane area for other geometries).  Pure host Python —
no TPU needed; the ladder decision is structural (fewer static macros is
strictly less skip work), only the RECOVERY SIZE needs this model.

Run: python experiments/model_skipwaste.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

ACTIVE_US = 73.6   # per active macro at (328,512), probe_skipmacro fit
SKIP_US = 32.5     # per skipped macro, same fit
REF_AREA = 328 * 512


def macro_cost_us(hb, wc):
    s = (hb * wc) / REF_AREA
    return ACTIVE_US * s, SKIP_US * s


def ladder_levels(nmac, k=4):
    """Static macro-count ladder: nmac, ceil(nmac/2), ceil(nmac/4), ..."""
    lv = []
    n = nmac
    for _ in range(k):
        lv.append(n)
        n = -(-n // 2)
    return sorted(set(lv))


def pick_level(levels, need):
    for lv in sorted(levels):
        if lv >= need:
            return lv
    return max(levels)


def main():
    from trialign.kernels import chain as CH
    from trialign.kernels import mosaic as MZ

    rng = np.random.default_rng(77)
    n_triplets = 1024
    trips = [
        tuple(
            rng.integers(0, 4, int(rng.integers(128, 512 + 1))).astype(np.uint8)
            for _ in range(3)
        )
        for _ in range(n_triplets)
    ]

    sop = True
    items, tall = [], []
    for i, t in enumerate(trips):
        rt = MZ._rotate(t, sop)
        if len(rt[1]) + 2 > MZ.HB or len(rt[2]) + 2 > MZ.WC:
            tall.append((i, rt))
        else:
            items.append((i, rt))

    print(f"canvas items {len(items)}  tall {len(tall)}")

    # ---- canvas path ----
    dispatches = MZ.pack_mosaic(items)
    la_cap = max(len(rt[0]) for _, rt in items)
    dims = MZ.plan_mosaic(la_cap)
    qqb, unb = dims[5], dims[10]
    nmac = qqb // unb
    a_us, s_us = macro_cost_us(MZ.HB, MZ.WC)
    tb, tc = MZ.HB - 1, MZ.WC - 1
    lvls = ladder_levels(nmac)
    tot_a = tot_s = tot_s_ladder = 0.0
    print(f"canvas dispatches {len(dispatches)}  static nmac {nmac}  "
          f"ladder {lvls}")
    for disp in dispatches:
        d = CH.chain_pitch(
            max(len(rt[0]) for t in disp for _, rt in t.problems), MZ.HB, MZ.WC
        )
        npk = max(len(t.problems) for t in disp)
        need = min(-(-(npk * d + tb + tc + unb - 1) // unb), nmac)
        lv = pick_level(lvls, need)
        tot_a += need * a_us
        tot_s += (nmac - need) * s_us
        tot_s_ladder += (lv - need) * s_us
    print(f"canvas: active {tot_a/1e3:.1f} ms  skip {tot_s/1e3:.1f} ms  "
          f"skip(ladder) {tot_s_ladder/1e3:.1f} ms")

    # ---- tall classes ----
    t_tot_a = t_tot_s = t_tot_s_ladder = 0.0
    blocked = 0
    by_class = {si: [] for si in range(len(MZ.TALL_SHAPES))}
    for i, rt in tall:
        cands = [si for si, (t_hb, t_wc, _) in enumerate(MZ.TALL_SHAPES)
                 if len(rt[1]) < t_hb and len(rt[2]) < t_wc - 1]
        if cands:
            si = min(cands,
                     key=lambda s: MZ.TALL_SHAPES[s][0] * MZ.TALL_SHAPES[s][1])
            by_class[si].append((i, rt))
        else:
            blocked += 1
    for si, chainable in by_class.items():
        if not chainable:
            continue
        t_hb, t_wc, t_unb = MZ.TALL_SHAPES[si]
        la_cap_t = max(len(rt[0]) for _, rt in chainable)
        dims_t = CH.plan_hetero(la_cap_t, t_hb - 1, t_wc - 2, MZ.CH_P_CAP,
                                t_hb, t_wc, t_unb, nb=4)
        qqb_t, nmac_t = dims_t[5], dims_t[5] // t_unb
        a_us_t, s_us_t = macro_cost_us(t_hb, t_wc)
        lvls_t = ladder_levels(nmac_t)
        chains = CH.pack_chains(chainable, max_p=MZ.CH_P_CAP)
        print(f"tall class {si} ({t_hb},{t_wc}): {len(chainable)} problems, "
              f"{len(chains)} chains, nmac {nmac_t}, ladder {lvls_t}")
        for chain in chains:
            la_max = max(len(rt[0]) for _, rt in chain)
            dd = max(CH.chain_pitch(la_max, t_hb, t_wc),
                     (t_hb + t_wc - 4) // 3 + 1)
            need = min(
                -(-(len(chain) * dd + t_hb + t_wc - 2 + t_unb - 1) // t_unb),
                nmac_t,
            )
            lv = pick_level(lvls_t, need)
            t_tot_a += need * a_us_t
            t_tot_s += (nmac_t - need) * s_us_t
            t_tot_s_ladder += (lv - need) * s_us_t
    print(f"tall: active {t_tot_a/1e3:.1f} ms  skip {t_tot_s/1e3:.1f} ms  "
          f"skip(ladder) {t_tot_s_ladder/1e3:.1f} ms  "
          f"(blocked residue {blocked})")

    wall_now = tot_a + tot_s + t_tot_a + t_tot_s
    wall_lad = tot_a + tot_s_ladder + t_tot_a + t_tot_s_ladder
    cells = sum(len(a) * len(b) * len(c) for a, b, c in trips)
    print(f"\nmodeled device time now: {wall_now/1e3:.1f} ms -> "
          f"{cells/wall_now/1e3:.2f} GCUPS (kernel-side only)")
    print(f"modeled with ladder:     {wall_lad/1e3:.1f} ms -> "
          f"{cells/wall_lad/1e3:.2f} GCUPS "
          f"({(wall_now/wall_lad - 1)*100:.0f}% faster)")


if __name__ == "__main__":
    main()
