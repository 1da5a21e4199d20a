"""CLI surface: run / analyze / compare subcommands (tiny shapes, CPU)."""

import json

import numpy as np

from cilqr_tpu.__main__ import main
import pytest


@pytest.mark.slow
def test_cli_run_and_analyze(tmp_path, capsys):
    rc = main([
        "run", "--scenario", "compare", "--cycles", "4", "--horizon", "8",
        "--out", str(tmp_path), "--x0", "60.0",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["cycles"] == 4
    assert (tmp_path / "experiment.log").exists()
    assert (tmp_path / "metrics.csv").exists()

    rc = main([
        "analyze", str(tmp_path / "experiment.log"), "--scenario", "compare",
    ])
    assert rc == 0
    row = json.loads(capsys.readouterr().out)
    assert np.isfinite(row["velocity_mean"])


@pytest.mark.slow
def test_cli_compare(tmp_path, capsys):
    rc = main([
        "compare", "--scenarios", "compare", "--algorithms",
        "cilqr,frenet_origin", "--runs", "2", "--cycles", "3",
        "--horizon", "8", "--out", str(tmp_path), "--x0", "60.0",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out)
    assert set(summary) == {"compare/cilqr", "compare/frenet_origin"}
    for v in summary.values():
        assert "collision_runs" in v and np.isfinite(v["velocity_mean"])
    text = (tmp_path / "comparison.csv").read_text()
    assert "frenet_origin" in text
