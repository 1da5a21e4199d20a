"""Profiling + checkpoint utilities."""

import time

import jax.numpy as jnp
import numpy as np

from cilqr_tpu.utils import checkpoint, profiling


def test_phase_timer():
    t = profiling.PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    t.record("b", 0.5)
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["mean_ms"] >= 9.0
    assert s["b"]["total_ms"] == 500.0
    assert "a" in t.dump()


def test_timed_blocks_async_dispatch():
    t = profiling.PhaseTimer()
    x = jnp.ones((256, 256))
    out = t.timed("matmul", lambda: x @ x)
    assert out.shape == (256, 256)
    assert t.summary()["matmul"]["count"] == 1


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "U_warm": jnp.ones((40, 2)) * 0.5,
        "key": np.arange(4, dtype=np.uint32),
        "step": np.asarray(17),
        "nested": {"J": jnp.asarray(3.5)},
    }
    p = tmp_path / "ckpt_000017.npz"
    checkpoint.save(str(p), tree)
    like = {
        "U_warm": jnp.zeros((40, 2)),
        "key": np.zeros(4, dtype=np.uint32),
        "step": np.asarray(0),
        "nested": {"J": jnp.asarray(0.0)},
    }
    back = checkpoint.restore(str(p), like)
    np.testing.assert_allclose(np.asarray(back["U_warm"]), 0.5)
    assert int(back["step"]) == 17
    assert float(back["nested"]["J"]) == 3.5


def test_checkpoint_shape_mismatch(tmp_path):
    p = tmp_path / "c.npz"
    checkpoint.save(str(p), {"a": np.zeros((3,))})
    try:
        checkpoint.restore(str(p), {"a": np.zeros((4,))})
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_latest_step(tmp_path):
    assert checkpoint.latest_step(str(tmp_path)) is None
    for s in (3, 11, 7):
        checkpoint.save(str(tmp_path / f"ckpt_{s:06d}.npz"), {"x": np.zeros(1)})
    assert checkpoint.latest_step(str(tmp_path)) == 11
    meta = {"step": 11, "scenario": "long"}
    checkpoint.save_metadata(str(tmp_path / "meta.json"), meta)
    assert checkpoint.load_metadata(str(tmp_path / "meta.json")) == meta


def test_tile_sublanes_validation(monkeypatch):
    """Advisor r4: malformed CILQR_TPU_TILE_SUBLANES must fall back to 8
    with a warning instead of breaking every import."""
    import warnings

    from cilqr_tpu.ops import riccati_pallas as rp

    for bad in ("banana", "0", "-8", "12"):
        monkeypatch.setenv("CILQR_TPU_TILE_SUBLANES", bad)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert rp._tile_sublanes() == 8
        assert any("CILQR_TPU_TILE_SUBLANES" in str(x.message) for x in w)
    for good, want in (("8", 8), ("16", 16)):
        monkeypatch.setenv("CILQR_TPU_TILE_SUBLANES", good)
        assert rp._tile_sublanes() == want


def test_compile_cache_warns_on_unwritable_dir(monkeypatch, tmp_path):
    """Advisor r4: an unusable cache dir must warn, not silently degrade."""
    import warnings

    from cilqr_tpu.utils import compile_cache

    blocker = tmp_path / "blocker"
    blocker.write_text("")  # a FILE where a directory is required
    monkeypatch.setenv("CILQR_TPU_CACHE_DIR", str(blocker / "sub"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        compile_cache.enable_compilation_cache()
    assert any("compilation cache disabled" in str(x.message) for x in w)


def test_slope_throughput_stall_guard():
    """Round 5: a tunnel stall straddling the whole throughput phase makes
    both group timings ~= the stall, exploding the slope (one full-bench
    run recorded a physically impossible 1.29e9 closed-loop cycles/s).
    The guard must reject such reps and fall back to the conservative
    blocking bound; a clean session must pass through unchanged."""
    from cilqr_tpu.benchmark import slope_throughput

    # Simulated device: each dispatch costs `per` seconds; `stall` adds a
    # constant per-group latency (the tunnel).  timer() advances only via
    # blocker(), which knows how many dispatches the group queued.
    class FakeClock:
        def __init__(self, per, stall):
            self.t, self.per, self.stall = 0.0, per, stall
            self.pending = 0

        def timer(self):
            return self.t

        def call(self, x):
            self.pending += 1
            return x

        def blocker(self, outs):
            self.t += self.stall + self.per * self.pending
            self.pending = 0

    items = 1000.0

    # clean session: slope recovers the per-dispatch device time exactly
    clk = FakeClock(per=0.1, stall=0.03)
    med, spread = slope_throughput(
        clk.call, lambda i: i, items, timer=clk.timer, blocker=clk.blocker)
    assert abs(med - items / 0.1) / (items / 0.1) < 1e-6
    assert spread[0] <= med <= spread[1]

    # stalled session: device time negligible vs a 5 s stall -> raw slope
    # would claim ~items/per = 1e7; the guard must cap at the blocking
    # bound items*g2/t2 instead of shipping the poisoned slope
    clk = FakeClock(per=1e-4, stall=5.0)
    med, spread = slope_throughput(
        clk.call, lambda i: i, items, timer=clk.timer, blocker=clk.blocker)
    bound = items * 4 / (5.0 + 4 * 1e-4)  # g2=4 dispatches, one stall
    assert med <= bound * 1.01
    assert med < 0.001 * (items / 1e-4)  # nowhere near the poisoned slope
