"""Native experiment-log roundtrip + corruption handling."""

import numpy as np
import pytest

explog = pytest.importorskip("cilqr_tpu.utils.explog")


def _make_records(n, N=10, seed=23):
    rng = np.random.default_rng(seed)
    return [
        dict(
            start_time=float(i) * 0.1,
            start_pos=rng.normal(0, 1, 4),
            planning_time=rng.uniform(0.001, 0.01),
            X=rng.normal(0, 1, (N + 1, 4)),
            U=rng.normal(0, 1, (N, 2)),
        )
        for i in range(n)
    ]


def test_roundtrip(tmp_path):
    path = tmp_path / "exp.log"
    recs = _make_records(7)
    with explog.ExperimentLog(path, "w") as log:
        for r in recs:
            log.append(**r)
        log.flush()
        assert len(log) == 7

    with explog.ExperimentLog(path, "r") as log:
        assert len(log) == 7
        for i, r in enumerate(recs):
            got = log.read(i)
            assert got.start_time == r["start_time"]
            np.testing.assert_allclose(got.start_pos, r["start_pos"])
            assert got.planning_time == r["planning_time"]
            np.testing.assert_allclose(got.X, r["X"])
            np.testing.assert_allclose(got.U, r["U"])


def test_append_mode(tmp_path):
    path = tmp_path / "exp.log"
    recs = _make_records(3)
    with explog.ExperimentLog(path, "w") as log:
        log.append(**recs[0])
    with explog.ExperimentLog(path, "a") as log:
        log.append(**recs[1])
        log.append(**recs[2])
    with explog.ExperimentLog(path, "r") as log:
        assert len(log) == 3


def test_torn_tail_is_truncated(tmp_path):
    """A partially-written last record must be dropped, not crash the reader
    (rosbag-style torn-write tolerance)."""
    path = tmp_path / "exp.log"
    with explog.ExperimentLog(path, "w") as log:
        for r in _make_records(4):
            log.append(**r)
    # chop 13 bytes off the tail
    data = path.read_bytes()
    path.write_bytes(data[:-13])
    with explog.ExperimentLog(path, "r") as log:
        assert len(log) == 3
        log.read(2)
        with pytest.raises(IndexError):
            log.read(3)


def test_corrupt_crc_detected(tmp_path):
    path = tmp_path / "exp.log"
    with explog.ExperimentLog(path, "w") as log:
        for r in _make_records(2):
            log.append(**r)
    data = bytearray(path.read_bytes())
    data[40] ^= 0xFF  # flip a payload byte in record 0
    path.write_bytes(bytes(data))
    with explog.ExperimentLog(path, "r") as log:
        assert len(log) == 0  # scan stops at first bad frame


def test_nested_iteration_independent(tmp_path):
    """Two simultaneous iterators over one handle must not share position."""
    path = tmp_path / "exp.log"
    with explog.ExperimentLog(path, "w") as log:
        for r in _make_records(4):
            log.append(**r)
        outer = []
        for a in log:
            inner = sum(1 for _ in log)
            assert inner == 4
            outer.append(a)
        assert len(outer) == 4


def test_partial_iterate_then_append(tmp_path):
    """Appending after a partial read must land at EOF, not overwrite."""
    path = tmp_path / "exp.log"
    recs = _make_records(4)
    with explog.ExperimentLog(path, "w") as log:
        for r in recs[:3]:
            log.append(**r)
        for _ in log:
            break  # leave the read position mid-file
        log.append(**recs[3])
        assert len(log) == 4
        got = log.read(3)
        np.testing.assert_allclose(got.X, recs[3]["X"])


def test_inconsistent_frame_sizes_rejected(tmp_path):
    """A CRC-valid frame whose declared sizes disagree with its length must
    be treated as corruption, never over-read."""
    import struct
    import zlib

    path = tmp_path / "exp.log"
    with explog.ExperimentLog(path, "w") as log:
        log.append(**_make_records(1)[0])
    data = bytearray(path.read_bytes())
    # forge a record declaring huge n_states but with a tiny payload
    header = struct.pack("<ddII", 0.0, 0.0, 2**20, 0) + b"\x00" * 32
    # the writer's CRC starts from 0xFFFFFFFF without final xor; replicate
    def crc(b):
        c = 0xFFFFFFFF
        for byte in b:
            c ^= byte
            for _ in range(8):
                c = (c >> 1) ^ (0xEDB88320 & (-(c & 1)))
        return c
    frame = struct.pack("<I", len(header)) + header + struct.pack("<I", crc(header))
    path.write_bytes(bytes(data) + frame)
    with explog.ExperimentLog(path, "r") as log:
        assert len(log) == 1           # forged frame ignored
        assert sum(1 for _ in log) == 1


def test_read_experiment_log_helper(tmp_path):
    path = tmp_path / "exp.log"
    with explog.ExperimentLog(path, "w") as log:
        for r in _make_records(5):
            log.append(**r)
    out = explog.read_experiment_log(str(path))
    assert out["start_pos"].shape == (5, 4)
    assert out["planning_time"].shape == (5,)
    assert out["X"][0].shape == (11, 4)
