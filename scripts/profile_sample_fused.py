"""A/B: prior-resample kernel grid=(B,T) vs fused grid=(B,) (varied inputs).

Usage: BENCH_FS_BATCH=4096 python scripts/profile_sample_fused.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _benchutil import timeit_varied

from cilqr_tpu.ops import gridmap, sample_pallas
from cilqr_tpu.utils.params import CostmapParams


def main():
    B = int(os.environ.get("BENCH_FS_BATCH", "4096"))
    cp = CostmapParams()
    gmap = jnp.asarray(
        np.random.default_rng(0).uniform(0, 100, (256, 256)), jnp.float32
    )
    ggeom = gridmap.make_geom([110.0, -300.0], 0.5, 256, 256, dtype=jnp.float32)

    def variant(k):
        r = np.random.default_rng(k)
        centers = jnp.asarray(
            np.stack([r.uniform(8, 12, B), r.uniform(-1, 1, B)], -1), jnp.float32
        )
        geoms = jax.vmap(
            lambda c: gridmap.make_geom(c, cp.resolution, cp.rows, cp.cols,
                                        dtype=jnp.float32)
        )(centers)
        egos = jnp.asarray(
            np.stack([r.uniform(100, 120, B), r.uniform(-310, -290, B)], -1),
            jnp.float32,
        )
        yaws = jnp.asarray(r.uniform(-3, 3, B), jnp.float32)
        return geoms, egos, yaws

    variants = [variant(k) for k in range(9)]  # 1 warm + 8 distinct timed

    ref = None
    for fused in (False, True):
        fn = jax.jit(
            lambda g, e, y, f=fused: sample_pallas.sample_prior_batched_tpu(
                g, cp.rows, cp.cols, cp.resolution, 0.5, gmap, ggeom, e, y,
                fused=f,
            )
        )
        tc0 = time.perf_counter()
        fn.lower(*variants[0]).compile()
        tc = time.perf_counter() - tc0
        t, out = timeit_varied(fn, variants)
        print(f"fused={fused}: {1e3 * t:8.2f} ms  (compile {tc:.1f}s)")
        if fused and ref is not None:
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
            print("bit-identical")
        else:
            ref = out


if __name__ == "__main__":
    main()
