"""Smoke test for the north-star benchmark driver (scripts/bench_northstar.py).

The north-star grid itself (every fused family x all 200 TF-Bind-8
landscapes, BASELINE.json's ">=50x wall-clock" target) only makes sense on
real TPU hardware; this test drives the same code path end-to-end at toy
budgets on the CPU backend so argument routing, the warmup-chunk shape
logic, and the summary accounting stay correct.
"""
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_northstar():
    spec = importlib.util.spec_from_file_location(
        "bench_northstar", os.path.join(REPO, "scripts", "bench_northstar.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_northstar_smoke(monkeypatch, capsys):
    mod = _load_northstar()
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "bench_northstar.py",
            "--families", "random", "adalead",
            "--landscapes", "2",
            "--rounds", "2",
            "--batch", "5",
            "--queries", "20",
            "--chunk", "4",
        ],
    )
    mod.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    # One line per family plus the summary.
    assert len(lines) == 3
    summary = lines[-1]
    assert summary["metric"] == "northstar_all_explorers_all_landscapes"
    assert summary["landscapes"] == 2
    assert summary["total_cells"] == sum(l["cells"] for l in lines[:-1])
    assert summary["total_seqs"] == sum(l["seqs"] for l in lines[:-1])
    for line in lines[:-1]:
        assert line["cells"] == 2  # 2 landscapes x 1 start x 1 ss
        assert line["seqs"] > 0
        assert 0.0 <= line["mean_max_fitness"] <= 1.2
