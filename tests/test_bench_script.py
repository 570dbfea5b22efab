"""bench.py orchestration invariants (no TPU, no subprocess stages).

The round-2 driver bench (BENCH_r02.json) died with rc=124 and NO output;
these tests pin the properties that prevent a repeat: the parent emits a
valid, complete JSON line after every stage, stays jax-free, and strips
the axon pool env from CPU-forced children (whose interpreter start
otherwise hangs in sitecustomize's register() when the tunnel is down).
"""

import importlib.util
import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench(tmp_path_factory):
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # Keep test log lines out of the repo's real bench_err.log.
    mod.ERR_LOG = str(tmp_path_factory.mktemp("bench") / "bench_err.log")
    return mod


def test_inlined_baseline_matches_benchmarks(bench):
    from trialign.benchmarks import BASELINE_ASIC_GCUPS

    r = bench.Runner()
    r.fields = {"blocked_1024_gcups": BASELINE_ASIC_GCUPS}
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        r.emit()
    out = json.loads(buf.getvalue().splitlines()[-1])
    # vs_baseline == 1.0 exactly iff the constant inlined in bench.emit()
    # equals trialign.benchmarks.BASELINE_ASIC_GCUPS.
    assert out["vs_baseline"] == 1.0


def test_emit_json_line_shape(bench, capsys):
    r = bench.Runner()
    # No headline field yet -> emit() must print nothing (not a broken line).
    r.emit()
    # CPU-smoke-only fields -> valid line with the smoke metric.
    r.fields = {"cpu_smoke_gcups": 0.012, "parity": "exact", "backend": "cpu"}
    r.emit()
    # Full TPU fields -> headline metric + extras carried through.
    r.fields.update(
        {"blocked_1024_gcups": 16.71, "blocked_1024_ms": 450.0,
         "hetero_512_ms": 9.68, "roofline_gcups": 24.0}
    )
    r.emit()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 2
    for ln in lines:
        rec = json.loads(ln)
        for key in ("metric", "value", "unit", "vs_baseline"):
            assert key in rec, (key, rec)
    final = json.loads(lines[-1])
    assert final["value"] == 16.71
    assert final["hetero_512_ms"] == 9.68
    assert final["roofline_fraction"] == round(16.71 / 24.0, 3)


def test_parent_module_is_jax_free(bench):
    """The orchestrating parent must never import jax: with the tunnel
    down, axon client init can hang any jax-importing process."""
    src = open(os.path.join(HERE, "bench.py")).read()
    import ast

    tree = ast.parse(src)
    # Module-level (parent-executed) imports only; stage fns import inside.
    for node in tree.body:
        if isinstance(node, ast.Import):
            assert not any(a.name.split(".")[0] in ("jax", "trialign")
                           for a in node.names)
        if isinstance(node, ast.ImportFrom):
            assert (node.module or "").split(".")[0] not in ("jax", "trialign")


def test_cpu_forced_child_env_strips_axon_pool(bench, monkeypatch):
    """run_stage must unset PALLAS_AXON_POOL_IPS for TRIALIGN_FORCE_CPU
    children so sitecustomize skips axon register() (measured hang:
    import jax 120 s -> 1 s with the var unset)."""
    captured = {}

    def fake_run(cmd, **kw):
        captured["env"] = kw.get("env")

        class P:
            returncode = 0
            stdout = 'FIELDS {"cpu_smoke_gcups": 1.0}\n'
            stderr = ""

        return P()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    r = bench.Runner()
    r.run_stage("cpu_smoke", 10, extra_env={"TRIALIGN_FORCE_CPU": "1"},
                force=True)
    assert "PALLAS_AXON_POOL_IPS" not in captured["env"]
    # Non-CPU stages keep the var (the tunnel needs it).
    r.run_stage("blocked_1k", 10)
    assert captured["env"].get("PALLAS_AXON_POOL_IPS") == "10.0.0.1"
