#!/usr/bin/env python
"""Microbenchmark: TPU gather strategies for the skybox bilinear fetch.

The frame needs, per pixel, 3 uint32 quads (one per channel) from a
quad-packed equirect table — information floor 96 bits/pixel. XLA TPU
gathers are near-serial per gathered SLICE, so the interesting question is
whether the per-slice cost is flat in the slice WIDTH: if yes, one gather
of (P, K)-row slices that pack all three channel quads side-by-side beats
three scalar-element gathers ~3x.

Also probes whether Mosaic (Pallas TPU) can lower a small VMEM-local gather
at all (for a future fully-fused kernel).
"""

import time as _time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=10):
    fn()
    jax.block_until_ready(fn())
    best = []
    for _ in range(3):
        t0 = _time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        best.append((_time.perf_counter() - t0) * 1000.0 / reps)
    return float(np.median(best))


def main():
    P = 1920 * 1080            # pixels
    HT, WT = 2049, 4096        # quad table (2048x4096 sky)
    N = HT * WT
    key = jax.random.PRNGKey(0)
    # realistic-ish: mostly coherent rows with wraparound spread
    idx = jax.random.randint(key, (1080, 1920), 0, N, dtype=jnp.int32)
    idx = jax.block_until_ready(idx)

    tab_flat = jnp.arange(N, dtype=jnp.uint32)
    tabs = [jax.block_until_ready(tab_flat + i) for i in range(3)]

    r = {}

    # 1) current: three flat element gathers
    f1 = jax.jit(lambda idx, tabs: [jnp.take(t, idx) for t in tabs])
    r["3x flat element take"] = timeit(lambda: f1(idx, tabs))

    # 2) one flat element gather (unit cost)
    f2 = jax.jit(lambda idx, t: jnp.take(t, idx))
    r["1x flat element take"] = timeit(lambda: f2(idx, tabs[0]))

    # 3) row gathers: table [N, K], take rows
    tile = jax.jit(lambda t, K: jnp.tile(t[:, None], (1, K)),
                   static_argnums=1)
    f3 = jax.jit(lambda idx, tabK: jnp.take(tabK, idx, axis=0))
    for K in (4, 8):
        tabK = jax.block_until_ready(tile(tab_flat, K))
        r[f"1x row take K={K}"] = timeit(lambda: f3(idx, tabK))
        del tabK

    # 4) row take + col split to 3 planes
    tab8 = jax.block_until_ready(tile(tab_flat, 8))
    idxr = idx.reshape(-1)

    f4 = jax.jit(lambda idxr, tab8: [jnp.take(tab8, idxr, axis=0)[:, c]
                                     for c in range(3)])
    r["row take K=8 + col split"] = timeit(lambda: f4(idxr, tab8))
    del tab8

    # 4b) K=4 2D-shaped idx + col split
    tab4 = jax.block_until_ready(tile(tab_flat, 4))
    f4b = jax.jit(lambda idx, tab4: [jnp.take(tab4, idx, axis=0)[..., c]
                                     for c in range(3)])
    r["row take K=4 + col split"] = timeit(lambda: f4b(idx, tab4))
    del tab4

    # 5) uint8 flat gather (dtype effect)
    tab_u8 = jax.block_until_ready(tab_flat.astype(jnp.uint8))
    f5 = jax.jit(lambda idx, t: jnp.take(t, idx))
    r["1x flat u8 take"] = timeit(lambda: f5(idx, tab_u8))

    for k, v in r.items():
        print(f"{k:28s} {v:8.2f} ms")

    # 6) Mosaic VMEM gather probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:].reshape(-1), idx_ref[:])

    try:
        tab_small = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
        idx_small = jnp.zeros((8, 128), jnp.int32) + 37
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab_small, idx_small)
        ok = bool((np.asarray(out) == 37).all())
        print(f"mosaic VMEM flat-take probe: compiled, correct={ok}")
    except Exception as e:
        print(f"mosaic VMEM flat-take probe: FAILED ({type(e).__name__}: "
              f"{str(e)[:200]})")

    def kern2(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    try:
        tab_small = jnp.arange(512 * 128, dtype=jnp.uint32).reshape(512, 128)
        idx_small = jnp.zeros((8, 128), jnp.int32) + 211
        out = pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab_small, idx_small)
        want = 211 * 128 + np.arange(128)
        ok = bool((np.asarray(out) == want[None, :]).all())
        print(f"mosaic VMEM take_along_axis(sublane) probe: compiled, "
              f"correct={ok}")
    except Exception as e:
        print(f"mosaic VMEM take_along_axis probe: FAILED "
              f"({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
