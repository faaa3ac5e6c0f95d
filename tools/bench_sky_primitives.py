#!/usr/bin/env python
"""On-chip primitive measurements for the sky-gather redesign (round 4).

Measures, on real silicon:
  1. XLA gather cost vs SLICE SHAPE (is the ~16 ns per-slice cost flat in
     slice size? if yes, fetching (4,4)-u32 slices per pixel GROUP beats
     per-pixel rows);
  2. the windowed one-hot Pallas kernel (ops/pallas_sky.sky_window_gather)
     at several (sub_rows, br, bc) — actual ms/frame vs the 33 ms
     row-gather, i.e. the real achievable MAC rate at N=12;
  3. in-kernel take_along_axis (sublane dynamic gather) feasibility.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tools.benchlib import timeit_hard_scalar

OUT = {}


def bench_slice_widths():
    """XLA gather of N slices from a table: per-slice cost vs slice shape."""
    n = 2_073_600  # 1080p pixels
    table = jnp.arange(2049 * 4096 * 4, dtype=jnp.uint32).reshape(-1, 4)
    key = jax.random.PRNGKey(0)
    for rows, name in ((1, "slice_1x4"), (2, "slice_2x4"), (4, "slice_4x4"),
                       (8, "slice_8x4")):
        cnt = n // rows
        idx = jax.random.randint(key, (cnt,), 0, table.shape[0] - rows,
                                 dtype=jnp.int32)

        @jax.jit
        def f(idx, table=table, rows=rows):
            # gather `cnt` slices of (rows, 4) via dynamic_slice semantics
            g = jax.vmap(
                lambda i: jax.lax.dynamic_slice(table, (i, 0), (rows, 4))
            )(idx)
            return jnp.sum(g >> 24)

        ms = timeit_hard_scalar(lambda f=f, idx=idx: f(idx))
        OUT[name] = {"ms": round(ms, 2), "slices": cnt,
                     "ns_per_slice": round(ms * 1e6 / cnt, 2)}
        print(name, OUT[name])


def bench_onehot_shapes():
    from relativisticraytracer_tpu.ops.pallas_sky import sky_window_gather
    from relativisticraytracer_tpu.render.skybox import (
        procedural_starfield,
        skybox_from_array,
    )

    sky = skybox_from_array(procedural_starfield(2048, 4096))
    n_rows = 16320
    key = jax.random.PRNGKey(1)
    fx = jax.random.uniform(key, (n_rows, 128), jnp.float32)
    fy = jax.random.uniform(key, (n_rows, 128), jnp.float32)
    for sub_rows, br, bc in ((8, 16, 128), (8, 32, 128), (8, 32, 256),
                             (8, 48, 192), (16, 48, 192), (4, 16, 128)):
        t = n_rows // sub_rows
        oy = jax.random.randint(key, (t,), 0, 2049 - br, jnp.int32)
        ox = jax.random.randint(key, (t,), 0, 4096 - bc, jnp.int32)
        origins = jnp.stack([oy, ox], axis=1)
        # in-window indices (correctness is CPU-tested; this is a rate bench)
        yl = jax.random.randint(key, (n_rows, 128), 0, br, jnp.int32)
        xl = jax.random.randint(key, (n_rows, 128), 0, bc, jnp.int32)
        idx = ((jnp.repeat(oy, sub_rows)[:, None] + yl) * 4096
               + jnp.repeat(ox, sub_rows)[:, None] + xl)

        @jax.jit
        def f(idx, origins, sub_rows=sub_rows, br=br, bc=bc):
            tr, tg, tb = sky_window_gather(
                sky, idx, origins, sub_rows=sub_rows, br=br, bc=bc)
            return jnp.sum(tr >> 24) + jnp.sum(tg >> 24) + jnp.sum(tb >> 24)

        name = f"onehot_sub{sub_rows}_{br}x{bc}"
        try:
            ms = timeit_hard_scalar(lambda: f(idx, origins))
            OUT[name] = {"ms": round(ms, 2), "K": br * bc}
        except Exception as e:
            OUT[name] = {"error": repr(e)[:200]}
        print(name, OUT[name])


def bench_take_along_axis_kernel():
    """Does a per-lane sublane gather lower inside a Pallas kernel, and at
    what rate? table (S, 128) f32, idx (8, 128) i32 per grid step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for s in (8, 16, 32, 64):
        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(
                tab_ref[...], idx_ref[...], axis=0)

        t = 2040
        tab = jax.random.uniform(jax.random.PRNGKey(0), (t * s, 128))
        idx = jax.random.randint(jax.random.PRNGKey(1), (t * 8, 128), 0, s,
                                 jnp.int32)
        try:
            f = pl.pallas_call(
                kernel,
                grid=(t,),
                in_specs=[
                    pl.BlockSpec((s, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t * 8, 128), jnp.float32),
            )
            g = jax.jit(lambda tab, idx: jnp.sum(f(tab, idx)))
            ms = timeit_hard_scalar(lambda: g(tab, idx))
            OUT[f"take_along_sublane_S{s}"] = {"ms": round(ms, 3)}
        except Exception as e:
            OUT[f"take_along_sublane_S{s}"] = {"error": repr(e)[:300]}
        print(f"take_along_sublane_S{s}", OUT[f"take_along_sublane_S{s}"])


def main():
    bench_slice_widths()
    bench_take_along_axis_kernel()
    bench_onehot_shapes()
    path = pathlib.Path(__file__).resolve().parents[1] / "docs" / \
        "sky_primitives.json"
    path.write_text(json.dumps(OUT, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
