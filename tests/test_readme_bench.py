"""README bench-block regeneration (scripts/update_readme_bench.py).

The README's measured-numbers paragraph is generated from the bench.py
JSON artifact (one source of truth, VERDICT r4 #7); these tests lock the
renderer so a bench field rename or marker edit cannot silently break the
regeneration path and let the README drift from the artifact again.
"""

import importlib.util
import pathlib

import pytest

_ROOT = pathlib.Path(__file__).resolve().parents[1]


def _load():
    spec = importlib.util.spec_from_file_location(
        "update_readme_bench", _ROOT / "scripts" / "update_readme_bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# A round-5-shaped artifact (field set of the current bench.py JSON line;
# values from a real run so the formatting assertions are realistic).
ARTIFACT = {
    "metric": "cilqr_solves_per_sec_1chip_N50_full_constraints",
    "value": 1386292.5,
    "value_spread": [1366215.5, 1422248.6],
    "unit": "solves/s",
    "vs_baseline": 1386.292,
    "path": "mega",
    "batch": 32768,
    "batched_step_ms": 23.637,
    "p50_single_solve_ms": 35.847,
    "p99_single_solve_ms": 52.435,
    "p99_session_spread_ms": [39.743, 68.103],
    "tunnel_rtt_p50_ms": 29.003,
    "tunnel_rtt_p99_ms": 186.922,
    "device_p99_single_solve_ms": 6.257,
    "p99_under_budget": True,
    "e2e_p99_under_budget": True,
    "device_single_solve_ms": 5.808,
    "device_single_solve_ms_pscan": 5.192,
    "device_single_solve_ms_mega_b1": 0.301,
    "mean_lm_iterations": 10.31,
    "mega_pct_of_sol": 24.0,
    "mega_sol_binding_resource": "VPU ALU ports",
    "device": "TPU v5 lite0",
    "mc_scenarios_per_sec": 100595.0,
    "mc_scenarios_per_sec_spread": [99824.1, 101400.9],
    "mc_window_radius": 12,
    "full_stack_cycles_per_sec": 66541.0,
    "full_stack_cycles_per_sec_spread": [66447.9, 66633.1],
    "closed_loop_cycles_per_sec": 1622046.2,
    "closed_loop_cycles_per_sec_spread": [1620390.5, 1624255.1],
}


def test_fmt_block_renders_every_headline_field():
    mod = _load()
    out = mod.fmt_block(ARTIFACT)
    # headline throughput, spread, target ratio
    assert "**1,386,292 solves/s**" in out  # {:,.0f} banker's rounding
    assert "1,366,216–1,422,249" in out
    assert "**1,386x**" in out
    # latency story: device time, pscan, device p99, budget flag, tunnel RTT
    assert "**5.8 ms device time**" in out
    assert "5.2 ms with" in out
    assert "device p99 6.3 ms" in out
    assert "`p99_under_budget: true`" in out
    assert "p50 29 ms / p99 187 ms" in out
    # serving fast path: B=1 mega + speedup ratio vs unfused
    assert "**0.30 ms** device time" in out
    assert "(19x the unfused" in out
    # extras with spreads
    assert "**100,595 scenarios/s**" in out
    assert "**66,541 plan-act cycles/s**" in out
    assert "spread 66,448–66,633" in out
    # speed-of-light line
    assert "24% of its" in out and "VPU ALU ports" in out


def test_fmt_block_degrades_without_optional_fields():
    """Optional fields (spreads, mega B=1, MC/full-stack extras) may be
    absent on reduced bench runs (BENCH_MC=0 etc.) — the renderer must
    drop those sentences, not crash."""
    mod = _load()
    d = {
        k: v
        for k, v in ARTIFACT.items()
        if k
        not in (
            "value_spread",
            "device_single_solve_ms_mega_b1",
            "mc_scenarios_per_sec",
            "mc_scenarios_per_sec_spread",
            "full_stack_cycles_per_sec",
            "full_stack_cycles_per_sec_spread",
        )
    }
    out = mod.fmt_block(d)
    assert "solves/s**" in out
    assert "spread" not in out
    assert "Serving fast path" not in out
    assert "Monte-Carlo" not in out


def test_apply_to_text_roundtrip_and_idempotence():
    mod = _load()
    text = "intro\n" + mod.BEGIN + " old -->\nSTALE NUMBERS\n" + mod.END + "\ntail\n"
    once = mod.apply_to_text(text, ARTIFACT)
    assert "STALE NUMBERS" not in once
    assert once.startswith("intro\n") and once.endswith("\ntail\n")
    assert "**1,386,292 solves/s**" in once
    assert mod.apply_to_text(once, ARTIFACT) == once  # idempotent


def test_apply_to_text_requires_markers():
    mod = _load()
    with pytest.raises(ValueError, match="markers not found"):
        mod.apply_to_text("no markers here", ARTIFACT)


def test_repo_readme_matches_renderer_contract():
    """The checked-in README block must still carry the markers and parse
    as a renderer product (begins with the generated-by comment)."""
    mod = _load()
    text = (_ROOT / "README.md").read_text()
    assert mod.BEGIN in text and mod.END in text
    # regenerating with the same artifact family must keep the document
    # structurally intact (markers, pre/post content preserved)
    out = mod.apply_to_text(text, ARTIFACT)
    assert out.count(mod.BEGIN) == 1 and out.count(mod.END) == 1
    assert text.split(mod.BEGIN)[0] == out.split(mod.BEGIN)[0]
    assert text.split(mod.END)[-1] == out.split(mod.END)[-1]
