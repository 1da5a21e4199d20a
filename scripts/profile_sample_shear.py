"""A/B: prior-resample window kernel vs shear-decomposition kernel on the
chip (varied inputs, production 152x104 @ 0.2 over 256^2 @ 0.5), plus an
on-hardware bit-identity check against the vmapped-XLA reference (Mosaic
lowering is not the interpreter — parity must hold on the chip too).

Usage: BENCH_FS_BATCH=4096 python scripts/profile_sample_shear.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _benchutil import timeit_varied

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cilqr_tpu.ops import costmap, gridmap, sample_pallas
from cilqr_tpu.utils.params import CostmapParams


def main():
    B = int(os.environ.get("BENCH_FS_BATCH", "4096"))
    cp = CostmapParams()
    gmap = jnp.asarray(
        np.random.default_rng(0).uniform(0, 100, (256, 256)), jnp.float32
    )
    ggeom = gridmap.make_geom([110.0, -300.0], 0.5, 256, 256, dtype=jnp.float32)
    assert sample_pallas.supports_shear(cp.rows, cp.cols, cp.resolution, 0.5,
                                        256, 256)

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
        yaws = jnp.asarray(r.uniform(-3.14, 3.14, B), jnp.float32)
        return geoms, egos, yaws

    variants = [variant(k) for k in range(9)]  # 1 warm + 8 distinct timed

    outs = {}
    for algo in ("window", "shear"):
        fn = jax.jit(
            lambda g, e, y, a=algo: sample_pallas.sample_prior_batched_tpu(
                g, cp.rows, cp.cols, cp.resolution, 0.5, gmap, ggeom, e, y,
                algo=a,
            )
        )
        tc0 = time.perf_counter()
        fn.lower(*variants[0]).compile()
        tc = time.perf_counter() - tc0
        t, out = timeit_varied(fn, variants)
        outs[algo] = np.asarray(out)
        print(f"{algo:>7}: {1e3 * t:8.2f} ms  ({1e6 * t / B:6.2f} us/map, "
              f"compile {tc:.1f}s)")
    np.testing.assert_array_equal(outs["shear"], outs["window"])
    print("shear == window: bit-identical on chip")

    # small-batch XLA ground truth on chip
    Bs = 64
    g, e, y = variant(99)
    gs = jax.tree.map(lambda a: a[:Bs], g)
    fn_s = jax.jit(
        lambda g_, e_, y_: sample_pallas.sample_prior_batched_tpu(
            g_, cp.rows, cp.cols, cp.resolution, 0.5, gmap, ggeom, e_, y_,
            algo="shear",
        )
    )
    want = jax.jit(jax.vmap(
        lambda g_, e_, y_: costmap.sample_prior(
            g_, cp.rows, cp.cols, gmap, ggeom, e_, y_)
    ))(gs, e[:Bs], y[:Bs])
    np.testing.assert_array_equal(np.asarray(fn_s(gs, e[:Bs], y[:Bs])),
                                  np.asarray(want))
    print("shear == XLA reference: bit-identical on chip")


if __name__ == "__main__":
    main()
