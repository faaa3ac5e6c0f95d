#!/usr/bin/env python
"""Microbench the sorted-replay bookkeeping primitives on the chip, one op
at a time, to attribute the ~100 ms overhead measured by
bench_replay_sorted.py. Each candidate is timed hard-synced in isolation
with realistic shapes (N = 1080p lane count, C = compact capacity)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.benchlib import timeit_hard


import jax
import jax.numpy as jnp
import numpy as np



def main():
    N = 16320 * 128          # 1080p lane count (2.09M)
    C = 1 << 17
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mask = jax.random.uniform(k1, (N,)) < 0.034
    flat = jnp.where(mask, jax.random.uniform(k2, (N,)) * 300.0, 0.0)
    planes = [jax.random.normal(jax.random.PRNGKey(i), (N,)) for i in range(21)]
    stacked = jnp.stack(planes, axis=1)           # (N, 21)
    src_host = np.sort(np.random.default_rng(0).choice(N, C, replace=False))
    src = jnp.asarray(src_host, jnp.int32)
    lens_c = jax.random.uniform(k3, (C,)) * 300.0
    vals = jax.random.normal(k3, (C,))

    cm = jnp.cumsum(mask.astype(jnp.int32))
    jax.block_until_ready((flat, stacked, src, lens_c, cm, vals))

    cases = {}

    f = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
    cases["cumsum_2M"] = timeit_hard(lambda: f(mask))

    f = jax.jit(lambda c: jnp.searchsorted(
        c, jnp.arange(1, C + 1, dtype=jnp.int32)))
    cases["searchsorted_scan_128K_in_2M"] = timeit_hard(lambda: f(cm))

    f = jax.jit(lambda c: jnp.searchsorted(
        c, jnp.arange(1, C + 1, dtype=jnp.int32), method="compare_all"))
    try:
        cases["searchsorted_compareall"] = timeit_hard(lambda: f(cm))
    except Exception as e:  # compare_all is O(N*C) — may be absurd
        cases["searchsorted_compareall"] = f"failed: {e}"

    f = jax.jit(lambda l: jnp.argsort(-l))
    cases["argsort_128K"] = timeit_hard(lambda: f(lens_c))

    f = jax.jit(lambda l: jnp.argsort(-jnp.concatenate([l, l])))
    cases["argsort_256K"] = timeit_hard(lambda: f(lens_c))

    f = jax.jit(lambda p, s: p[s])
    cases["gather_1plane_128K_from_2M"] = timeit_hard(lambda: f(planes[0], src))

    def g21(s, *ps):
        return jnp.stack([p[s] for p in ps], axis=1)

    f = jax.jit(g21)
    cases["gather_21planes_separate"] = timeit_hard(lambda: f(src, *planes))

    f = jax.jit(lambda st, s: st[s, :])
    cases["gather_rows_2Mx21"] = timeit_hard(lambda: f(stacked, src))

    f = jax.jit(lambda st, s: jnp.take(st, s, axis=0))
    cases["take_rows_2Mx21"] = timeit_hard(lambda: f(stacked, src))

    f = jax.jit(lambda v, s: jnp.zeros((N,), jnp.float32).at[s].set(
        v, mode="drop", unique_indices=True))
    cases["scatter_128K_into_2M"] = timeit_hard(lambda: f(vals, src))

    f = jax.jit(lambda v, s: jnp.zeros((N,), jnp.float32).at[s].set(
        v, mode="drop", unique_indices=True, indices_are_sorted=True))
    cases["scatter_128K_sorted_idx"] = timeit_hard(lambda: f(vals, src))

    # one-cumsum ranking alternative to argsort: 16-bucket permutation
    def bucket_perm(l):
        edges = jnp.asarray([1, 2, 4, 8, 16, 24, 32, 48, 64, 96, 128, 160,
                             200, 240, 280], jnp.float32)
        b = jnp.searchsorted(edges, l)                     # (C,) in [0,16)
        onehot = b[:, None] == jnp.arange(16)[None, :]     # (C,16) bool
        ranks = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
        counts = ranks[-1]
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(counts)[:-1]])
        dest = offsets[b] + jnp.sum(onehot * (ranks - 1), axis=1)
        return dest

    f = jax.jit(bucket_perm)
    cases["bucket16_perm_128K"] = timeit_hard(lambda: f(lens_c))

    for k, v in cases.items():
        print(f"{k:36s} {v if isinstance(v, str) else f'{v:9.2f} ms'}")


if __name__ == "__main__":
    main()
