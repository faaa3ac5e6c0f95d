#!/usr/bin/env python
"""Microbench the ROW-COMPACTED sorted-replay bookkeeping on the chip.

bench_bookkeeping.py attributed the naive bookkeeping: searchsorted over
the 2M-lane cumsum costs 63 ms and per-plane gathers 30 ms — hopeless.
This measures the row-compaction alternative: only 801 of 16320 image
rows carry media (docs/segment_stats.json media_rows), so

  1. row bookkeeping over 16320 rows (mask/cumsum/searchsorted) ~ free,
  2. contiguous row-gather of the 21 record planes into a 1024-row
     (131072-lane) buffer,
  3. argsort 131K lanes by replay length (empty lanes sort last),
  4. permutation row-gather of the stacked (131K, 21) records,
  5. inverse-permutation gather of the 4 result planes,
  6. row-scatter back into the 16320-row image.

Prints per-op ms and the summed pipeline cost; the decision rule is
  sum + sorted_replay_kernel_ms  <  replay_image_b16_ms (50.3)
from docs/bench_replay_sorted.json.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.benchlib import timeit_hard


import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 16320          # 1080p padded rows of 128 lanes
ROW_CAP = 1024          # static row capacity (801 media rows measured)
M = ROW_CAP * 128       # compact lane domain
PLANES = 21             # 3 slots x (p0,v0 = 6) + 3 lens



def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # media rows clustered like the real pose: 801 consecutive-ish rows
    row_has = jnp.zeros((N_ROWS,), bool).at[4000:4801].set(True)
    # per-lane lengths: ~69% of lanes in media rows carry media
    lane_len = jnp.where(
        (jax.random.uniform(k1, (N_ROWS, 128)) < 0.69) & row_has[:, None],
        jax.random.uniform(k2, (N_ROWS, 128)) * 300.0, 0.0)
    planes = [jax.random.normal(jax.random.PRNGKey(i), (N_ROWS, 128))
              for i in range(PLANES)]
    jax.block_until_ready((lane_len, *planes))

    cases = {}

    # 1. row bookkeeping: mask -> cumsum -> searchsorted (16K domain)
    def row_bk(ll):
        rmask = jnp.any(ll > 0.0, axis=1)
        rcm = jnp.cumsum(rmask.astype(jnp.int32))
        rsrc = jnp.searchsorted(rcm, jnp.arange(1, ROW_CAP + 1,
                                                dtype=jnp.int32))
        rvalid = jnp.arange(ROW_CAP, dtype=jnp.int32) < rcm[-1]
        return jnp.where(rvalid, rsrc, 0)
    f = jax.jit(row_bk)
    cases["row_bookkeeping_16K"] = timeit_hard(lambda: f(lane_len))
    rsrc = f(lane_len)

    # 2a. row-gather 21 planes separately (1024 contiguous rows each)
    def rg_sep(rs, *ps):
        return jnp.stack([p[rs] for p in ps], axis=-1)
    f2a = jax.jit(rg_sep)
    cases["rowgather_21planes_sep"] = timeit_hard(lambda: f2a(rsrc, *planes))

    # 2b. stack once then one row-gather
    stacked = jnp.stack(planes, axis=-1)  # (N_ROWS, 128, 21)
    jax.block_until_ready(stacked)
    f2b = jax.jit(lambda rs, st: st[rs])
    cases["rowgather_stacked"] = timeit_hard(lambda: f2b(rsrc, stacked))
    f2s = jax.jit(lambda *ps: jnp.stack(ps, axis=-1))
    cases["stack_21planes_2M"] = timeit_hard(lambda: f2s(*planes))

    comp = f2b(rsrc, stacked)              # (ROW_CAP, 128, 21)
    lens_c = comp[:, :, 0].reshape(-1)     # stand-in lens plane
    flat21 = comp.reshape(M, PLANES)
    jax.block_until_ready((comp, lens_c, flat21))

    # 3. argsort 131K
    f3 = jax.jit(lambda l: jnp.argsort(-l))
    cases["argsort_131K"] = timeit_hard(lambda: f3(lens_c))
    order = f3(lens_c)

    # 4. permutation gather of (131K, 21)
    f4 = jax.jit(lambda st, o: st[o])
    cases["permgather_131Kx21"] = timeit_hard(lambda: f4(flat21, order))

    # 4b. permutation gather plane-by-plane (21 fused gathers)
    def pg_sep(o, st):
        return jnp.stack([st[:, j][o] for j in range(PLANES)], axis=-1)
    f4b = jax.jit(pg_sep)
    cases["permgather_21sep"] = timeit_hard(lambda: f4b(order, flat21))

    # 5. inverse perm: scatter arange, then gather 4 result planes back
    f5i = jax.jit(lambda o: jnp.zeros((M,), jnp.int32).at[o].set(
        jnp.arange(M, dtype=jnp.int32), unique_indices=True))
    cases["invperm_scatter_131K"] = timeit_hard(lambda: f5i(order))
    inv = f5i(order)
    res4 = jax.random.normal(k1, (M, 4))
    jax.block_until_ready((inv, res4))
    f5 = jax.jit(lambda r, i: r[i])
    cases["invgather_131Kx4"] = timeit_hard(lambda: f5(res4, inv))

    # 5b. alternative: scatter rows (131K,4) by order
    f5b = jax.jit(lambda r, o: jnp.zeros((M, 4), jnp.float32).at[o].set(
        r, unique_indices=True))
    cases["rowscatter_131Kx4"] = timeit_hard(lambda: f5b(res4, order))

    # 6. row-scatter 1024 rows back into 16320-row image (4 planes)
    res_rows = jax.random.normal(k2, (ROW_CAP, 128, 4))
    jax.block_until_ready(res_rows)
    f6 = jax.jit(lambda r, rs: jnp.zeros((N_ROWS, 128, 4), jnp.float32)
                 .at[rs].set(r, mode="drop", unique_indices=True))
    cases["rowscatter_back_image"] = timeit_hard(lambda: f6(res_rows, rsrc))

    # 7. the whole bookkeeping fused in ONE jit (lets XLA overlap/fuse)
    def full(ll, *ps):
        rmask = jnp.any(ll > 0.0, axis=1)
        rcm = jnp.cumsum(rmask.astype(jnp.int32))
        rs = jnp.searchsorted(rcm, jnp.arange(1, ROW_CAP + 1,
                                              dtype=jnp.int32))
        rvalid = jnp.arange(ROW_CAP, dtype=jnp.int32) < rcm[-1]
        rs = jnp.where(rvalid, rs, 0)
        st = jnp.stack(ps, axis=-1)               # (N,128,21)
        comp = st[rs] * rvalid[:, None, None]     # (CAP,128,21)
        ll_c = (ll[rs] * rvalid[:, None]).reshape(-1)
        o = jnp.argsort(-ll_c)
        flat = comp.reshape(M, PLANES)[o]
        inv = jnp.zeros((M,), jnp.int32).at[o].set(
            jnp.arange(M, dtype=jnp.int32), unique_indices=True)
        return flat, inv, rs
    f7 = jax.jit(full)
    cases["FUSED_pre_bookkeeping"] = timeit_hard(
        lambda: f7(lane_len, *planes)[0])

    def post(r4, inv, rs):
        img = r4[inv].reshape(ROW_CAP, 128, 4)
        return jnp.zeros((N_ROWS, 128, 4), jnp.float32).at[rs].set(
            img, mode="drop", unique_indices=True)
    flat_s, inv_s, rs_s = f7(lane_len, *planes)
    jax.block_until_ready((flat_s, inv_s, rs_s))
    f8 = jax.jit(post)
    cases["FUSED_post_scatterback"] = timeit_hard(
        lambda: f8(res4, inv_s, rs_s))

    for k, v in cases.items():
        print(f"{k:32s} {v:9.2f} ms")
    print(f"{'SUM pre+post':32s} "
          f"{cases['FUSED_pre_bookkeeping'] + cases['FUSED_post_scatterback']:9.2f} ms")


if __name__ == "__main__":
    main()
