"""A/B the per-scenario-map bilinear sampler (hybrid mega-solve hot op).

sample_bilinear_with_grad_batched fetches the 4 bilinear corners with TWO
row-one-hot einsums (row0, row1), each reading the full (B, H, W) map
stack from HBM.  The candidate merges them into ONE einsum over a
(B, 2N, H) stacked one-hot — same MACs, half the map reads — worth ~6 ms
of the ~29 ms/cycle the hybrid solve spends sampling at B=4096 IF the op
is map-read-bound (it may instead be one-hot-materialization- or
MXU-bound; that is what this measures).

Timing: in-jit chained slope (K dependent repetitions inside one
dispatch), the only method the axon tunnel cannot poison.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_sample_grad.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from cilqr_tpu.ops import gridmap

    B, H, W, N = 4096, 152, 104, 51
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.uniform(0, 100, (B, H, W)), jnp.float32)
    centers = jnp.asarray(rng.uniform(-2, 10, (B, 2)), jnp.float32)
    geom = jax.vmap(
        lambda c: gridmap.make_geom(c, 0.2, H, W, dtype=jnp.float32))(centers)
    pos = jnp.asarray(
        centers[:, None, :]
        + rng.uniform(-8, 8, (B, N, 2)).astype(np.float32), jnp.float32)

    def merged(data_, geom_, pos_):
        B_, H_, W_ = data_.shape
        res = geom_.resolution.reshape(B_, 1)
        first = geom_.center + 0.5 * geom_.length - 0.5 * res
        ci = (first[:, None, :] - pos_) / res[:, :, None]
        fi = jnp.clip(ci[..., 0], 0.0, H_ - 1.0)
        fj = jnp.clip(ci[..., 1], 0.0, W_ - 1.0)
        i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, H_ - 2)
        j0 = jnp.clip(jnp.floor(fj).astype(jnp.int32), 0, W_ - 2)
        ti = fi - i0
        tj = fj - j0
        hp = jax.lax.Precision.HIGHEST
        dt = data_.dtype
        rows = jax.nn.one_hot(
            jnp.concatenate([i0, i0 + 1], axis=1), H_, dtype=dt)  # (B,2N,H)
        R = jnp.einsum("bnh,bhw->bnw", rows, data_, precision=hp)
        R0, R1 = R[:, :N], R[:, N:]
        col0 = jax.nn.one_hot(j0, W_, dtype=dt)
        col1 = jax.nn.one_hot(j0 + 1, W_, dtype=dt)
        v00 = jnp.sum(R0 * col0, axis=-1)
        v01 = jnp.sum(R0 * col1, axis=-1)
        v10 = jnp.sum(R1 * col0, axis=-1)
        v11 = jnp.sum(R1 * col1, axis=-1)
        return gridmap._bilinear_tail(v00, v01, v10, v11, ti, tj, -1.0 / res)

    def slope_ms(fn, k1=2, k2=10, reps=5):
        def make_chain(k):
            def f(p_):
                def body(i, p__):
                    val, grad = fn(data, geom, p__)
                    return p__ + 1e-7 * grad + 1e-9 * val[..., None]
                return jax.lax.fori_loop(0, k, body, p_)
            return jax.jit(f)

        c1, c2 = make_chain(k1), make_chain(k2)
        jax.block_until_ready(c1(pos))
        jax.block_until_ready(c2(pos))
        t1s, t2s = [], []
        for r in range(reps):
            pr = pos + 1e-5 * (r + 1)
            t0 = time.perf_counter()
            jax.block_until_ready(c1(pr))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(c2(pr))
            t2s.append(time.perf_counter() - t0)
        return (float(np.median(t2s)) - float(np.median(t1s))) / (k2 - k1) * 1e3

    def with_precision(prec):
        def f(data_, geom_, pos_):
            B_, H_, W_ = data_.shape
            res = geom_.resolution.reshape(B_, 1)
            first = geom_.center + 0.5 * geom_.length - 0.5 * res
            ci = (first[:, None, :] - pos_) / res[:, :, None]
            fi = jnp.clip(ci[..., 0], 0.0, H_ - 1.0)
            fj = jnp.clip(ci[..., 1], 0.0, W_ - 1.0)
            i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, H_ - 2)
            j0 = jnp.clip(jnp.floor(fj).astype(jnp.int32), 0, W_ - 2)
            ti = fi - i0
            tj = fj - j0
            dt = data_.dtype
            row0 = jax.nn.one_hot(i0, H_, dtype=dt)
            row1 = jax.nn.one_hot(i0 + 1, H_, dtype=dt)
            R0 = jnp.einsum("bnh,bhw->bnw", row0, data_, precision=prec)
            R1 = jnp.einsum("bnh,bhw->bnw", row1, data_, precision=prec)
            col0 = jax.nn.one_hot(j0, W_, dtype=dt)
            col1 = jax.nn.one_hot(j0 + 1, W_, dtype=dt)
            v00 = jnp.sum(R0 * col0, axis=-1)
            v01 = jnp.sum(R0 * col1, axis=-1)
            v10 = jnp.sum(R1 * col0, axis=-1)
            v11 = jnp.sum(R1 * col1, axis=-1)
            return gridmap._bilinear_tail(
                v00, v01, v10, v11, ti, tj, -1.0 / res)
        return f

    t_cur = slope_ms(gridmap.sample_bilinear_with_grad_batched)
    print(f"two-einsum HIGHEST (current) : {t_cur:7.3f} ms/call  "
          f"(B={B}, N={N})")
    t_mrg = slope_ms(merged)
    print(f"merged one-einsum HIGHEST    : {t_mrg:7.3f} ms/call  "
          f"({t_cur / t_mrg:.2f}x)")
    t_high = slope_ms(with_precision(jax.lax.Precision.HIGH))
    print(f"two-einsum HIGH (bf16x3)     : {t_high:7.3f} ms/call  "
          f"({t_cur / t_high:.2f}x)")
    t_def = slope_ms(with_precision(jax.lax.Precision.DEFAULT))
    print(f"two-einsum DEFAULT (bf16)    : {t_def:7.3f} ms/call  "
          f"({t_cur / t_def:.2f}x; NOT shippable — fetch rounds to bf16)")

    va, ga = jax.jit(gridmap.sample_bilinear_with_grad_batched)(
        data, geom, pos)
    vb, gb = jax.jit(merged)(data, geom, pos)
    print("merged bit-identical:",
          bool(jnp.array_equal(va, vb) & jnp.array_equal(ga, gb)))
    vh, gh = jax.jit(with_precision(jax.lax.Precision.HIGH))(data, geom, pos)
    print("HIGH bit-identical:",
          bool(jnp.array_equal(va, vh) & jnp.array_equal(ga, gh)))


if __name__ == "__main__":
    main()
