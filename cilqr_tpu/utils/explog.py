"""ctypes bindings for the native experiment log (native/explog.cpp) —
the framework's `rosbag record /experiment` equivalent
(vehiclepub/msg/Experiment.msg payload: start_time, start_pos[4],
planning_time, X[], U[]).

The shared library is built on demand with `make -C native` (g++ only; no
pybind11 in this image, hence the plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Iterator, NamedTuple

import numpy as np

_lib = None


def _native_dir() -> pathlib.Path:
    """Locate the native sources/library: CILQR_TPU_NATIVE_DIR env override,
    then the repo checkout layout (<repo>/native next to the package)."""
    import os

    env = os.environ.get("CILQR_TPU_NATIVE_DIR")
    candidates = [pathlib.Path(env)] if env else []
    candidates.append(pathlib.Path(__file__).resolve().parents[2] / "native")
    for c in candidates:
        if (c / "libexplog.so").exists() or (c / "explog.cpp").exists():
            return c
    raise OSError(
        "cilqr_tpu native sources not found (looked in "
        + ", ".join(str(c) for c in candidates)
        + "). Installed without the repo checkout? Set CILQR_TPU_NATIVE_DIR "
        "to a directory containing native/explog.cpp (shipped in the sdist)."
    )


def _installed_ext() -> pathlib.Path | None:
    """A wheel-installed build of the library (setup.py ext_modules) — a
    `_explog_native*.so` artifact next to this file; dlopen'ed, never
    imported (it exports a C ABI, not a Python module)."""
    hits = sorted(pathlib.Path(__file__).resolve().parent.glob("_explog_native*.so"))
    return hits[0] if hits else None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _installed_ext()
    if so is None:
        native = _native_dir()
        so = native / "libexplog.so"
        if not so.exists():
            subprocess.run(["make", "-C", str(native)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.explog_open.restype = ctypes.c_void_p
    lib.explog_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    dp = ctypes.POINTER(ctypes.c_double)
    lib.explog_append.restype = ctypes.c_int
    lib.explog_append.argtypes = [
        ctypes.c_void_p, ctypes.c_double, dp, ctypes.c_double,
        dp, ctypes.c_uint32, dp, ctypes.c_uint32,
    ]
    lib.explog_flush.argtypes = [ctypes.c_void_p]
    lib.explog_count.restype = ctypes.c_int64
    lib.explog_count.argtypes = [ctypes.c_void_p]
    lib.explog_record_sizes.restype = ctypes.c_int
    lib.explog_record_sizes.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.explog_read.restype = ctypes.c_int
    lib.explog_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        dp, dp, dp, dp, ctypes.c_uint32, dp, ctypes.c_uint32,
    ]
    lib.explog_data_start.restype = ctypes.c_long
    lib.explog_data_start.argtypes = []
    lib.explog_frame_sizes.restype = ctypes.c_int
    lib.explog_frame_sizes.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.explog_read_frame.restype = ctypes.c_int
    lib.explog_read_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long),
        dp, dp, dp, dp, ctypes.c_uint32, dp, ctypes.c_uint32,
    ]
    lib.explog_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class Record(NamedTuple):
    start_time: float
    start_pos: np.ndarray     # (4,)
    planning_time: float
    X: np.ndarray             # (N+1, 4)
    U: np.ndarray             # (N, 2)


def _as_dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class ExperimentLog:
    """Append-only CRC-framed experiment log."""

    MODES = {"w": 0, "r": 1, "a": 2}

    def __init__(self, path: str, mode: str = "w"):
        self._lib = _load()
        self._h = self._lib.explog_open(str(path).encode(), self.MODES[mode])
        if not self._h:
            raise OSError(f"explog_open failed for {path!r} mode={mode!r}")
        self.path = str(path)

    def append(self, start_time, start_pos, planning_time, X, U) -> None:
        start_pos = np.ascontiguousarray(start_pos, dtype=np.float64).reshape(4)
        X = np.ascontiguousarray(X, dtype=np.float64)
        U = np.ascontiguousarray(U, dtype=np.float64)
        rc = self._lib.explog_append(
            self._h, float(start_time), _as_dp(start_pos), float(planning_time),
            _as_dp(X), X.size, _as_dp(U), U.size,
        )
        if rc != 0:
            raise OSError(f"explog_append rc={rc}")

    def flush(self) -> None:
        self._lib.explog_flush(self._h)

    def __len__(self) -> int:
        self.flush()
        n = self._lib.explog_count(self._h)
        if n < 0:
            raise OSError("explog_count failed")
        return int(n)

    def read(self, i: int) -> Record:
        ns, nc = ctypes.c_uint32(), ctypes.c_uint32()
        rc = self._lib.explog_record_sizes(self._h, i, ctypes.byref(ns), ctypes.byref(nc))
        if rc != 0:
            raise IndexError(f"record {i} unavailable (rc={rc})")
        st = ctypes.c_double()
        pt = ctypes.c_double()
        sp = np.empty(4, np.float64)
        X = np.empty(ns.value, np.float64)
        U = np.empty(nc.value, np.float64)
        rc = self._lib.explog_read(
            self._h, i, ctypes.byref(st), _as_dp(sp), ctypes.byref(pt),
            _as_dp(X), ns.value, _as_dp(U), nc.value,
        )
        if rc != 0:
            raise OSError(f"explog_read rc={rc}")
        n_ctrl = nc.value // 2
        return Record(st.value, sp, pt.value, X.reshape(-1, 4), U.reshape(n_ctrl, 2))

    def __iter__(self) -> Iterator[Record]:
        """Sequential O(1)-per-record scan.  The offset cursor is owned by
        this Python iterator (not the handle), so nested or concurrent
        iterations over the same log are independent; stops at the first
        torn/corrupt frame like the indexed reader."""
        self.flush()
        off = ctypes.c_long(self._lib.explog_data_start())
        while True:
            ns, nc = ctypes.c_uint32(), ctypes.c_uint32()
            rc = self._lib.explog_frame_sizes(
                self._h, off.value, ctypes.byref(ns), ctypes.byref(nc)
            )
            if rc != 0:
                return
            st = ctypes.c_double()
            pt = ctypes.c_double()
            sp = np.empty(4, np.float64)
            X = np.empty(ns.value, np.float64)
            U = np.empty(nc.value, np.float64)
            rc = self._lib.explog_read_frame(
                self._h, off.value, ctypes.byref(off),
                ctypes.byref(st), _as_dp(sp), ctypes.byref(pt),
                _as_dp(X), ns.value, _as_dp(U), nc.value,
            )
            if rc != 0:
                return
            n_ctrl = nc.value // 2
            yield Record(st.value, sp, pt.value, X.reshape(-1, 4), U.reshape(n_ctrl, 2))

    def close(self) -> None:
        if self._h:
            self._lib.explog_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_experiment_log(path: str):
    """Bag-reader equivalent (``read_experiment_bag``, dataprocess.py:12-40):
    returns dict of stacked arrays."""
    with ExperimentLog(path, "r") as log:
        recs = list(log)
    return {
        "start_time": np.array([r.start_time for r in recs]),
        "start_pos": np.stack([r.start_pos for r in recs]) if recs else np.zeros((0, 4)),
        "planning_time": np.array([r.planning_time for r in recs]),
        "X": [r.X for r in recs],
        "U": [r.U for r in recs],
    }
