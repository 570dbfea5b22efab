"""Mosaic 2D-tiling batch tests (kernels/mosaic.py) on a shrunken canvas
so CPU interpret mode stays fast; the tiling/band machinery is identical
to the production (HB, WC) canvas."""

import numpy as np
import pytest

from trialign.config import Scoring
from trialign.golden import align_planes_numpy
from tests.conftest import random_triplet

pytestmark = pytest.mark.heavy  # minutes-long on CPU interpret


@pytest.fixture
def small_canvas(monkeypatch):
    import trialign.kernels.mosaic as M

    monkeypatch.setattr(M, "HB", 48)
    monkeypatch.setattr(M, "WC", 128)
    monkeypatch.setattr(M, "BANDS", (24, 24))
    monkeypatch.setattr(M, "P_CAP", 4)
    monkeypatch.setattr(M, "NT_MAX", 6)
    monkeypatch.setattr(M, "CH_P_CAP", 4)
    monkeypatch.setattr(M, "TALL_SHAPES", ((80, 128, 8),))
    return M


def _rt(rng, la, lb, lc):
    return tuple(rng.integers(0, 4, s).astype(np.uint8) for s in (la, lb, lc))


def test_mosaic_mixed_batch(rng, small_canvas):
    M = small_canvas
    trips = [
        _rt(rng, 12, 10, 14), _rt(rng, 9, 12, 11), _rt(rng, 15, 8, 16),
        _rt(rng, 11, 12, 9), _rt(rng, 10, 10, 14), _rt(rng, 12, 10, 14),
        (np.zeros(0, np.uint8), np.zeros(3, np.uint8), np.zeros(3, np.uint8)),
        _rt(rng, 20, 6, 9), _rt(rng, 7, 18, 12), _rt(rng, 22, 20, 30),
    ]
    got = M.align_batch_mosaic(trips)
    want = [
        align_planes_numpy(*t) if min(map(len, t)) else 0 for t in trips
    ]
    assert got == want


def test_mosaic_vertical_stacking(rng, small_canvas):
    """Tiles stacked in different askew bands of the same lane range must
    carry independent A chains (the multi-band window path)."""
    M = small_canvas
    # many small-lb problems -> packer stacks tiles across both bands
    trips = [_rt(rng, 10 + i, 14, 20 + i) for i in range(8)]
    got = M.align_batch_mosaic(trips)
    assert got == [align_planes_numpy(*t) for t in trips]


def test_mosaic_rotation_rtl_mode(rng, small_canvas):
    """rtl-mode s3 is only A<->B symmetric; the rotation must respect it.
    Adversarial: many |C|>|A| and |B|>|A| triplets (where the old A<->C
    rotation fired and corrupted scores)."""
    from trialign.config import Scoring

    M = small_canvas
    sc = Scoring(s3_mode="rtl")
    trips = [_rt(rng, 8, 15, 20), _rt(rng, 25, 12, 9), _rt(rng, 10, 10, 10)]
    for _ in range(17):
        la = int(rng.integers(3, 9))
        trips.append(_rt(rng, la, int(rng.integers(la, 16)),
                         int(rng.integers(la + 1, 20))))
    got = M.align_batch_mosaic(trips, sc)
    assert got == [align_planes_numpy(*t, sc) for t in trips]


def test_mosaic_oversize_falls_back(rng, small_canvas):
    """Problems beyond the canvas route through the blocked path."""
    M = small_canvas
    trips = [_rt(rng, 8, 60, 200), _rt(rng, 10, 12, 14)]
    got = M.align_batch_mosaic(trips)
    assert got == [align_planes_numpy(*t) for t in trips]


def test_mosaic_tall_class_choice_and_blocked_residue(rng, small_canvas,
                                                      monkeypatch):
    """Tall problems pick the min-area fitting class; problems fitting no
    class drain through the async blocked residue path, scores exact."""
    M = small_canvas
    monkeypatch.setattr(M, "TALL_SHAPES", ((80, 128, 8), (100, 64, 8)))
    picked = []
    orig = M.CH.plan_hetero

    def spy_plan(la_cap, lbc, lcc, npack, hb, wc, unb, **kw):
        picked.append((hb, wc))
        return orig(la_cap, lbc, lcc, npack, hb, wc, unb, **kw)

    monkeypatch.setattr(M.CH, "plan_hetero", spy_plan)
    trips = [
        _rt(rng, 8, 60, 120),    # fits both classes: (100, 64) is smaller
        _rt(rng, 8, 90, 200),    # mid 90 >= 80: only (100, 64) fits
        _rt(rng, 90, 90, 200),   # mid 90, min 90: no class -> blocked
        _rt(rng, 10, 12, 14),    # canvas
    ]
    got = M.align_batch_mosaic(trips, residue_route="blocked")
    assert got == [align_planes_numpy(*t) for t in trips]
    assert (100, 64) in picked and (80, 128) not in picked


def test_residue_route_model(small_canvas):
    """The residue router's lane-slot model: many near-cubic problems
    amortize the chain ramp (-> dynamic chain class), a singleton pays
    full band tax for nothing (-> blocked)."""
    M = small_canvas
    mk = lambda la, lb, lc: (np.zeros(la, np.uint8), np.zeros(lb, np.uint8),
                             np.zeros(lc, np.uint8))
    many = [(i, mk(100, 85 + i % 4, 40 + i % 4)) for i in range(8)]
    blocked_items, grp = M._route_residue(many)
    assert grp is not None and not blocked_items
    dims_r, chains = grp
    assert sum(len(c) for c in chains) == 8
    assert all(len(c) <= M.CH_P_CAP for c in chains)
    # force flags override the model both ways
    assert M._route_residue(many, force="blocked") == (many, None)
    one = [(0, mk(100, 85, 40))]
    assert M._route_residue(one, force="chain")[1] is not None


def test_residue_chain_route_parity(rng, small_canvas):
    """Residue through the dynamic hetero-chain class (two chains: a
    shared final cell splits the pack) scores exactly, and agrees with
    the forced-blocked route."""
    M = small_canvas
    trips = [
        _rt(rng, 100, 85, 40),
        _rt(rng, 95, 88, 42),
        _rt(rng, 98, 85, 40),    # collides with #0's final cell -> chain 2
        _rt(rng, 10, 12, 14),    # canvas
    ]
    want = [align_planes_numpy(*t) for t in trips]
    assert M.align_batch_mosaic(trips, residue_route="chain") == want
    assert M.align_batch_mosaic(trips, residue_route="blocked") == want


def test_mosaic_sharded_canvas(rng, small_canvas):
    """Canvas dispatches spread across a mesh 'data' axis: same scores,
    one compiled fleet (includes tall + blocked residue on the side)."""
    from trialign.dist.mesh import default_mesh

    M = small_canvas
    mesh = default_mesh()
    assert mesh.shape["data"] >= 2
    trips = [_rt(rng, int(rng.integers(3, 12)), int(rng.integers(4, 16)),
                 int(rng.integers(4, 30))) for _ in range(8)]
    # 5 tall problems -> 2 chains at CH_P_CAP=4: exercises the sharded
    # tall-chain fleet (stack + snake-balance) alongside the canvas.
    for _ in range(5):
        trips.append(_rt(rng, int(rng.integers(4, 9)),
                         int(rng.integers(50, 64)),
                         int(rng.integers(80, 110))))
    trips.append(_rt(rng, 80, 85, 110))   # blocked residue (fleet of 2)
    trips.append(_rt(rng, 70, 82, 95))
    got = M.align_batch_mosaic(trips, mesh=mesh)
    assert got == [align_planes_numpy(*t) for t in trips]


def test_sharded_batch_routes_to_mosaic(rng, small_canvas, monkeypatch):
    """align_batch_sharded sends large mixed batches through the mesh-
    aware mosaic engine (api.align_batch's gate), scores exact."""
    from trialign.dist.batch import align_batch_sharded
    from trialign.dist.mesh import default_mesh

    M = small_canvas
    monkeypatch.setenv("TRIALIGN_FORCE_MOSAIC", "1")
    calls = []
    orig = M.align_batch_mosaic

    def spy(trips, scoring, mesh=None):
        calls.append((len(trips), mesh is not None))
        return orig(trips, scoring, mesh=mesh)

    monkeypatch.setattr(M, "align_batch_mosaic", spy)
    trips = [_rt(rng, int(rng.integers(3, 10)), int(rng.integers(4, 12)),
                 int(rng.integers(4, 20))) for _ in range(64)]
    got = align_batch_sharded(trips, mesh=default_mesh())
    assert got == [align_planes_numpy(*t) for t in trips]
    assert calls == [(64, True)]


def test_mosaic_packer_geometry(rng, small_canvas):
    M = small_canvas
    items = [(i, _rt(rng, 10, 14, 20)) for i in range(10)]
    disps = M.pack_mosaic(items)
    for disp in disps:
        assert len(disp) <= M.NT_MAX
        for t in disp:
            assert t.j0 + t.th <= M.HB and t.k0 + t.tw <= M.WC
            assert len(t.problems) <= M.P_CAP
            # band-wise column exclusivity
            for u in disp:
                if u is t or u.b1 < t.b0 or u.b0 > t.b1:
                    continue
                assert u.k0 + u.tw <= t.k0 or t.k0 + t.tw <= u.k0
    assert sum(len(t.problems) for d_ in disps for t in d_) == 10


def test_mosaic_packer_hooks(rng, small_canvas):
    """The A/B hooks (order_key placement order, tw_quant width snap-up)
    produce legal packings; tw_quant widens tiles to the grid so narrow
    problems can pair side-by-side (experiments/model_fill2.py)."""
    M = small_canvas
    items = [(i, _rt(rng, 10, 14, 20 + (i % 3))) for i in range(8)]
    # reversed order: smallest |B| first (opposite of the default)
    disps = M.pack_mosaic(items, order_key=lambda it: len(it[1][1]))
    assert sum(len(t.problems) for d_ in disps for t in d_) == 8
    # width quantization: every tile's lane width lands on the grid
    disps = M.pack_mosaic(items, tw_quant=(64, 128))
    for disp in disps:
        for t in disp:
            assert t.tw in (64, 128), t.tw
            assert t.k0 + t.tw <= M.WC
    assert sum(len(t.problems) for d_ in disps for t in d_) == 8
    # empty grid = no quantization (exact lc + 2 widths)
    disps = M.pack_mosaic(items, tw_quant=())
    widths = {t.tw for d_ in disps for t in d_}
    assert all(w <= 24 for w in widths), widths


def test_api_align_batch_routes_large_to_mosaic(rng, small_canvas, monkeypatch):
    """api.align_batch uses mosaic tiling from 64 triplets up (on TPU;
    forced here since interpret-mode mosaic is gated off)."""
    from trialign.api import align_batch

    monkeypatch.setenv("TRIALIGN_FORCE_MOSAIC", "1")
    trips = [
        tuple(rng.integers(0, 4, int(rng.integers(5, 16))).astype(np.uint8)
              for _ in range(3))
        for _ in range(64)
    ]
    res = align_batch(trips)
    want = [align_planes_numpy(*t) for t in trips]
    assert [r.score for r in res] == want


def test_api_align_batch_long_a_skips_mosaic(rng, small_canvas, monkeypatch):
    """Long-A batches must NOT go to the mosaic canvas (its static sweep
    scales with la_cap x P_CAP); they route to the bucketed path, and
    mixed batches split between the two (VERDICT r2 item 7)."""
    import trialign.api as api

    monkeypatch.setenv("TRIALIGN_FORCE_MOSAIC", "1")
    calls = {"mosaic": 0, "padded": 0}
    import trialign.dist.batch as DB
    import trialign.kernels.mosaic as M

    real_padded = DB.align_batch_padded

    def spy_mosaic(trips, scoring=None, *a, **k):
        calls["mosaic"] += len(trips)
        raise AssertionError("mosaic must not receive long-A triplets")

    def spy_padded(trips, *a, **k):
        calls["padded"] += len(trips)
        return real_padded(trips, *a, **k)

    monkeypatch.setattr(M, "align_batch_mosaic", spy_mosaic)
    monkeypatch.setattr(DB, "align_batch_padded", spy_padded)
    # short sequences but fake-long A via the routing predicate: use real
    # long A with tiny B/C so the padded path stays cheap
    la = api.LA_MOSAIC_CAP + 1
    trips = [
        (rng.integers(0, 4, la).astype(np.uint8),
         rng.integers(0, 4, 3).astype(np.uint8),
         rng.integers(0, 4, 4).astype(np.uint8))
        for _ in range(64)
    ]
    res = api.align_batch(trips)
    assert calls["padded"] == 64 and calls["mosaic"] == 0
    want = [align_planes_numpy(*t) for t in trips[:2]]
    assert [r.score for r in res[:2]] == want


def test_production_geometry_invariants():
    """Tripwire for the SHIPPED canvas constants (round-3 VERDICT item 8):
    hardware legality (HBM DMA slices are wc wide -> wc must be a
    multiple of 128; bands DMA at 8-row sublane granularity), the VMEM
    spill-cliff budget, and a pinned snapshot so any regression of
    HB/WC/BANDS/TALL_SHAPES is a deliberate, reviewed change."""
    import trialign.kernels.mosaic as M

    g = M.current_geometry()
    # Hardware legality.
    assert g.wc % 128 == 0, "canvas askew slab slice must be 128-aligned"
    assert sum(g.bands) == g.hb, (g.bands, g.hb)
    assert all(b % 8 == 0 for b in g.bands), g.bands
    for t_hb, t_wc, t_unb in g.tall_shapes:
        assert t_wc % 128 == 0, \
            f"tall class ({t_hb},{t_wc}) askew slice must be 128-aligned"
        assert t_hb % 8 == 0, (t_hb, t_wc)
    # VMEM model: resident planes x plane bytes under the measured ~55 MB
    # spill cliff (CLAUDE.md hardware facts; 2*unb Mosaic stack planes +
    # 17 sweep-state planes + the band ring + margin).
    def vmem_bytes(hb, wc, unb, nbr):
        return (2 * unb + 17 + 2 * nbr + 5) * hb * wc * 4
    assert vmem_bytes(g.hb, g.wc, g.unb, 9) < 55 * 2**20  # canvas, NB=6
    for t_hb, t_wc, t_unb in g.tall_shapes:
        assert vmem_bytes(t_hb, t_wc, t_unb, 7) < 55 * 2**20  # NB=4
    # Pinned snapshot -- update deliberately alongside a measured probe.
    assert (g.hb, g.wc) == (328, 512)
    assert g.bands == (136, 128, 64)
    assert g.tall_shapes == M.TALL_SHAPES


def test_geometry_parameter_coexists_with_default(rng):
    """The geom= parameter must drive the whole pack/plan/prep/batch stack
    without touching module state: a shrunk-geometry batch and default
    planning calls interleave safely."""
    import trialign.kernels.mosaic as M
    from trialign.golden import align_planes_numpy

    small = M.CanvasGeometry(hb=48, wc=128, bands=(24, 24), nt_max=6,
                             p_cap=4, unb=8, ch_p_cap=4,
                             tall_shapes=((80, 128, 8),))
    trips = [_rt(rng, 12, 10, 24) for _ in range(4)]
    want = [align_planes_numpy(*t) for t in trips]
    got = M.align_batch_mosaic(trips, geom=small)
    assert got == want
    # Module defaults untouched: production geometry still current.
    assert M.current_geometry().hb == M.HB == 328


def test_mosaic_submatrix_parity(rng):
    """Runtime submatrix through the full mosaic stack (canvas tiles +
    tall class + residue routing) on a shrunk geometry."""
    import trialign.kernels.mosaic as M
    from trialign.golden import align_planes_numpy

    small = M.CanvasGeometry(hb=48, wc=128, bands=(24, 24), nt_max=6,
                             p_cap=4, unb=8, ch_p_cap=4,
                             tall_shapes=((80, 128, 8),))
    sub = ((2, -1, -2, -1), (-1, 2, -1, -2), (-2, -1, 2, -1),
           (-1, -2, -1, 2))
    scoring = Scoring(submatrix=sub)
    trips = [_rt(rng, 12, 10, 24), _rt(rng, 8, 14, 9), _rt(rng, 20, 60, 30),
             _rt(rng, 5, 21, 40)]
    want = [align_planes_numpy(*t, scoring) for t in trips]
    got = M.align_batch_mosaic(trips, scoring, geom=small)
    assert got == want


def test_submatrix_geometry_under_vmem_cliff():
    """The submatrix default geometry must keep every kernel class under
    the measured ~55 MB spill cliff WITH the 3-plane ring."""
    import trialign.kernels.mosaic as M

    g = M.submatrix_geometry()

    def vmem_bytes(hb, wc, unb, nbr, rp=3):
        return ((2 * unb + 17 + (1 + rp) * nbr + 5) * hb * wc) * 4
    assert vmem_bytes(g.hb, g.wc, g.unb, 9) < 55 * 2**20
    for t_hb, t_wc, t_unb in g.tall_shapes:
        assert vmem_bytes(t_hb, t_wc, t_unb, 7) < 55 * 2**20


def test_api_routes_eligible_submatrix_to_mosaic(rng, small_canvas,
                                                 monkeypatch):
    """api.align_batch sends large batches with a <=4-symbol byte-range
    submatrix through the mosaic engine (round-5 fast path) instead of
    the padded fallback; ineligible matrices keep the old route."""
    from trialign.api import align_batch

    M = small_canvas
    monkeypatch.setenv("TRIALIGN_FORCE_MOSAIC", "1")
    calls = []
    orig = M.align_batch_mosaic

    def spy(trips, scoring, **kw):
        calls.append(len(trips))
        return orig(trips, scoring, **kw)

    monkeypatch.setattr(M, "align_batch_mosaic", spy)
    sub = ((2, -1, -2, -1), (-1, 2, -1, -2), (-2, -1, 2, -1),
           (-1, -2, -1, 2))
    scoring = Scoring(submatrix=sub)
    trips = [_rt(rng, int(rng.integers(3, 10)), int(rng.integers(4, 12)),
                 int(rng.integers(4, 20))) for _ in range(64)]
    res = align_batch(trips, scoring)
    assert [r.score for r in res] == [align_planes_numpy(*t, scoring)
                                      for t in trips]
    assert calls == [64]
    # a 5-symbol matrix is ring-ineligible: stays off mosaic
    big = tuple(tuple(1 if i == j else -1 for j in range(5))
                for i in range(5))
    res2 = align_batch(trips[:4], Scoring(submatrix=big))
    assert calls == [64]
    assert [r.score for r in res2] == [
        align_planes_numpy(*t, Scoring(submatrix=big)) for t in trips[:4]
    ]
