#!/usr/bin/env python
"""Hardware-grounded VPU roofline for the vacuum march.

Round 1 claimed a roofline from assumed peak rates and retracted it; round
2 left the utilization question open. This closes it with MEASUREMENT on
both sides:

  1. CEILING: Pallas microkernels that run nothing but register-resident
     vector arithmetic in a while loop — independent multiply-add chains
     (the march's op mix is mul/add-dominated), plus pure chains of the
     march's two special functions (rsqrt for RK4, exp for compositing).
     Timed hard-synced on the chip; reports sustained lane-ops/s. This is
     what THIS chip actually executes when nothing else is in the way —
     a tighter bound than quoting a spec sheet.

  2. DEMAND: the per-step vector-op count of the march, taken mechanically
     from the jaxpr of march_step (vacuum work = everything outside the
     media lax.cond branches, probes included) — no hand-waving. Weighted:
     1 lane-op per elementwise primitive, with the measured cost ratios
     for rsqrt/exp folded in.

  utilization = (lane_steps * ops_per_step) / (ceiling * measured_time)

where lane_steps for the 1080p headline frame comes from
docs/media_fire.json (march_lane_steps at the production tile shape).

Run on the chip:  python tools/vpu_roofline.py
Writes docs/roofline.json.
"""

import argparse
import functools
import json
import pathlib
import sys
import time as _time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from relativisticraytracer_tpu.config import SceneConfig  # noqa: E402
from relativisticraytracer_tpu.core.vecmath import Vec3  # noqa: E402
from relativisticraytracer_tpu.render.march import (  # noqa: E402
    MarchState,
    march_step,
)

OUT = pathlib.Path(__file__).resolve().parents[1] / "docs"

TILE_ROWS = 32          # one (32, 128) lane tile, like the march kernel
CHAINS = 8              # independent accumulator chains (hide ALU latency)
INNER = 64              # ops per chain per loop iteration


def _sync(x):
    return float(np.asarray(jnp.sum(x.ravel()[:16])))


def _chain_kernel(op, iters, x_ref, o_ref):
    accs = [x_ref[...] * (1.0 + 0.001 * c) for c in range(CHAINS)]
    b = x_ref[...] * 0.5 + 0.25

    def body(i, accs):
        out = []
        for a in accs:
            for _ in range(INNER):
                if op == "fma":
                    a = a * 1.0000001 + b
                elif op == "rsqrt":
                    a = jax.lax.rsqrt(a) + b
                elif op == "exp":
                    a = jnp.exp(a * -0.0000001)
            out.append(a)
        return out

    accs = jax.lax.fori_loop(0, iters, body, accs)
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("op", "iters", "tiles"))
def _chain(op, iters, tiles, x):
    return pl.pallas_call(
        functools.partial(_chain_kernel, op, iters),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((TILE_ROWS, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * TILE_ROWS, 128), jnp.float32),
    )(x)


def measure_ceiling(op, iters=2000, tiles=8, reps=3):
    x = jnp.full((TILE_ROWS, 128), 1.01, jnp.float32)
    _sync(_chain(op, iters, tiles, x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = _time.perf_counter()
        _sync(_chain(op, iters, tiles, x))
        best = min(best, _time.perf_counter() - t0)
    lane_ops = tiles * TILE_ROWS * 128 * CHAINS * INNER * iters
    # fma counts as ONE issued vector op (mul+add fuse); rsqrt/exp chains
    # interleave one special + one add per step -> report the SPECIAL rate
    # by subtracting the known add cost is overkill; treat each chain step
    # as one op of the named kind (the add hides under the special's
    # latency in practice).
    return lane_ops / best, best


def count_march_ops(scene: SceneConfig):
    """Vector-op count of one march step per lane, from the jaxpr.

    Walks the top-level jaxpr of march_step(media_cond=True) — the Pallas
    kernel's per-step body — WITHOUT descending into the media lax.cond
    branches (tile-skipped in vacuum). Counts each elementwise primitive
    as one lane-op; returns (total, by_primitive, specials)."""
    z = jnp.zeros((8, 128), jnp.float32)
    zb = jnp.zeros((8, 128), bool)
    st = MarchState(Vec3(z, z, z), Vec3(z, z, z), Vec3(z, z, z), z, zb, zb)

    def step(st):
        return march_step(scene, st, jnp.float32(1.0), media_cond=True)

    jaxpr = jax.make_jaxpr(step)(st).jaxpr
    # cond bodies are the tile-skipped media blocks (not vacuum work);
    # reductions/broadcasts/layout ops are free or amortized
    skip = {"cond", "reduce_or", "reduce_and", "reduce_sum",
            "broadcast_in_dim", "convert_element_type", "reshape", "squeeze"}
    counts = {}

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in skip:
                continue
            if name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                        "custom_vjp_call"):
                inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
                if inner is not None:
                    walk(getattr(inner, "jaxpr", inner))
                continue
            counts[name] = counts.get(name, 0) + 1

    walk(jaxpr)
    total = sum(counts.values())
    return total, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--march-ms", type=float, default=None,
                    help="measured fused-march kernel ms/frame at 1080p "
                         "(defaults to the PERF.md round-3 number)")
    args = ap.parse_args()

    report = {"platform": jax.devices()[0].platform}
    for op in ("fma", "rsqrt", "exp"):
        rate, t = measure_ceiling(op)
        report[f"{op}_lane_ops_per_s"] = rate
        report[f"{op}_bench_s"] = t
        print(f"{op}: {rate/1e12:.3f} T lane-ops/s  (best of 3: {t*1000:.1f} ms)")

    scene = SceneConfig()
    total, counts = count_march_ops(scene)
    # specials cost more than 1 fma-slot: weight by measured rate ratios
    fma_rate = report["fma_lane_ops_per_s"]
    weights = {
        "rsqrt": fma_rate / report["rsqrt_lane_ops_per_s"],
        "exp": fma_rate / report["exp_lane_ops_per_s"],
        "sqrt": fma_rate / report["rsqrt_lane_ops_per_s"],
    }
    weighted = 0.0
    for name, n in counts.items():
        weighted += n * weights.get(name, 1.0)
    report["march_ops_per_step"] = total
    report["march_ops_weighted"] = weighted
    report["march_op_counts"] = counts
    print(f"march step: {total} vector ops/lane "
          f"({weighted:.1f} fma-equivalents)")

    mf = OUT / "media_fire.json"
    if mf.exists():
        fire = json.loads(mf.read_text())
        lane_steps = fire["march_lane_steps"]["32x128"]
        report["lane_steps_1080p"] = lane_steps
        demand = lane_steps * weighted
        report["vacuum_demand_fma_equiv"] = demand
        report["vacuum_floor_ms_at_ceiling"] = demand / fma_rate * 1e3
        if args.march_ms:
            report["measured_march_ms"] = args.march_ms
            report["vpu_utilization"] = (
                demand / fma_rate * 1e3 / args.march_ms
            )
            print(f"vacuum floor at ceiling: "
                  f"{report['vacuum_floor_ms_at_ceiling']:.1f} ms; measured "
                  f"{args.march_ms:.1f} ms -> utilization "
                  f"{report['vpu_utilization']*100:.0f}%")
        else:
            print(f"vacuum floor at ceiling: "
                  f"{report['vacuum_floor_ms_at_ceiling']:.1f} ms")

    OUT.mkdir(exist_ok=True)
    (OUT / "roofline.json").write_text(json.dumps(report, indent=2))
    print(f"wrote {OUT/'roofline.json'}")


if __name__ == "__main__":
    main()
