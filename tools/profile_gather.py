"""Raw TPU gather vs scatter throughput for the extend-add redesign.

Usage: timeout 1800 python tools/profile_gather.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, sync, iters=5, warmup=2):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    S = 7158
    N_out = (S + 1) * (S + 1)          # 51.3M
    N_src = 10_000_000

    src = jax.random.normal(key, (N_src,), dtype=jnp.float32)
    idx_np = np.random.default_rng(0).integers(0, N_src, size=N_out)
    idx = jnp.asarray(idx_np, dtype=jnp.int32)

    f = jax.jit(lambda s: s[idx].reshape(S + 1, S + 1))
    t = bench(lambda: f(src), lambda o: float(o[0, 0]))
    print(f"gather 51.3M from 10M table      : {t*1e3:9.1f} ms")

    # 2-pass gather + add
    idx2 = jnp.asarray(np.random.default_rng(1).integers(0, N_src, size=N_out),
                       dtype=jnp.int32)
    f2 = jax.jit(lambda s: (s[idx] + s[idx2]).reshape(S + 1, S + 1))
    t = bench(lambda: f2(src), lambda o: float(o[0, 0]))
    print(f"2x gather 51.3M + add            : {t*1e3:9.1f} ms")

    # contiguous-block gather: same volume but indices sorted
    idx_sorted = jnp.asarray(np.sort(idx_np), dtype=jnp.int32)
    f3 = jax.jit(lambda s: s[idx_sorted].reshape(S + 1, S + 1))
    t = bench(lambda: f3(src), lambda o: float(o[0, 0]))
    print(f"gather 51.3M sorted indices      : {t*1e3:9.1f} ms")

    # small scatter-adds at various sizes
    for n in (100_000, 500_000, 2_000_000, 9_900_000):
        sidx = jnp.asarray(np.random.default_rng(2).integers(0, N_out, size=n),
                           dtype=jnp.int32)
        vals = jax.random.normal(key, (n,), dtype=jnp.float32)

        def fsc(v, si=sidx):
            out = jnp.zeros((N_out,), dtype=jnp.float32)
            return out.at[si].add(v)

        fs = jax.jit(fsc)
        t = bench(lambda: fs(vals), lambda o: float(o[0]))
        print(f"scatter-add {n/1e6:4.1f}M into 51.3M    : {t*1e3:9.1f} ms")

    # scatter-add into an EXISTING array (no zeros init)
    big = jax.random.normal(key, (N_out,), dtype=jnp.float32)
    sidx = jnp.asarray(np.random.default_rng(3).integers(0, N_out, size=2_000_000),
                       dtype=jnp.int32)
    vals = jax.random.normal(key, (2_000_000,), dtype=jnp.float32)
    fs2 = jax.jit(lambda b, v: b.at[sidx].add(v))
    t = bench(lambda: fs2(big, vals), lambda o: float(o[0]))
    print(f"scatter-add 2M into existing     : {t*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
