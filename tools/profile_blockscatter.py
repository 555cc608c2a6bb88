"""Block-window scatter vs element scatter for front assembly / extend-add.

Usage: timeout 2400 python tools/profile_blockscatter.py
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
    rng = np.random.default_rng(0)

    # extend-add scale: 1.1M 3x3 blocks into [p=100, nv=105, nv=105] block grid
    p, nv = 100, 105
    NB = 1_100_000
    blocks = jax.random.normal(key, (NB, 3, 3), dtype=jnp.float32)
    bi = rng.integers(0, p, size=NB)
    br = rng.integers(0, nv, size=NB)
    bc = rng.integers(0, nv, size=NB)

    # (a) block scatter via .at with window semantics: index the block grid
    tgt_idx = jnp.asarray(bi * nv * nv + br * nv + bc, dtype=jnp.int32)

    def block_scatter(blocks):
        out = jnp.zeros((p * nv * nv, 3, 3), dtype=jnp.float32)
        return out.at[tgt_idx].add(blocks)

    f = jax.jit(block_scatter)
    t = bench(lambda: f(blocks), lambda o: float(o[0, 0, 0]))
    print(f"block scatter 1.1M x (3,3) windows        : {t*1e3:9.1f} ms")

    # (b) same but sorted target indices
    order = np.argsort(np.asarray(tgt_idx), kind="stable")
    tgt_sorted = jnp.asarray(np.asarray(tgt_idx)[order])
    blocks_s = blocks[jnp.asarray(order)]

    def block_scatter_sorted(blocks):
        out = jnp.zeros((p * nv * nv, 3, 3), dtype=jnp.float32)
        return out.at[tgt_sorted].add(blocks, indices_are_sorted=True)

    f2 = jax.jit(block_scatter_sorted)
    t = bench(lambda: f2(blocks_s), lambda o: float(o[0, 0, 0]))
    print(f"block scatter sorted                      : {t*1e3:9.1f} ms")

    # (c) segment_sum formulation (block rows)
    def segsum(blocks):
        return jax.ops.segment_sum(blocks, tgt_sorted,
                                   num_segments=p * nv * nv,
                                   indices_are_sorted=True)

    f3 = jax.jit(segsum)
    t = bench(lambda: f3(blocks_s), lambda o: float(o[0, 0, 0]))
    print(f"segment_sum blocks sorted                 : {t*1e3:9.1f} ms")

    # (d) the transpose [p, nv, nv, 3, 3] -> [p, nv*3, nv*3]
    grid = jax.random.normal(key, (p, nv, nv, 3, 3), dtype=jnp.float32)

    def to_dense(g):
        return g.transpose(0, 1, 3, 2, 4).reshape(p, nv * 3, nv * 3)

    f4 = jax.jit(to_dense)
    t = bench(lambda: f4(grid), lambda o: float(o[0, 0, 0]))
    print(f"block grid -> dense transpose (9.9M)      : {t*1e3:9.1f} ms")

    # (e) assembly scale: 83k blocks into [100, 233, 233] grid
    NB2 = 83_000
    nv2 = 233
    blocks2 = jax.random.normal(key, (NB2, 3, 3), dtype=jnp.float32)
    t2 = jnp.asarray(rng.integers(0, p * nv2 * nv2, size=NB2), dtype=jnp.int32)

    def asm(blocks):
        out = jnp.zeros((p * nv2 * nv2, 3, 3), dtype=jnp.float32)
        return out.at[t2].add(blocks)

    f5 = jax.jit(asm)
    t = bench(lambda: f5(blocks2), lambda o: float(o[0, 0, 0]))
    print(f"assembly block scatter 83k x (3,3)        : {t*1e3:9.1f} ms")

    # (f) one-hot matmul extend-add: parent += P S P^T batched
    # children: 200 nodes, sd=150, parent front 300
    nc, sd, fp = 200, 150, 304
    S = jax.random.normal(key, (nc, sd, sd), dtype=jnp.float32)
    Ponehot = np.zeros((nc, fp, sd), dtype=np.float32)
    for k in range(nc):
        rows = rng.choice(fp, size=sd, replace=False)
        Ponehot[k, rows, np.arange(sd)] = 1.0
    P = jnp.asarray(Ponehot)

    def onehot_ea(S):
        T = jnp.einsum("kfs,kst,kgt->kfg", P, S, P,
                       precision=jax.lax.Precision.DEFAULT)
        return T

    f6 = jax.jit(onehot_ea)
    t = bench(lambda: f6(S), lambda o: float(o[0, 0, 0]))
    print(f"one-hot matmul extend-add 200x(304,150)   : {t*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
