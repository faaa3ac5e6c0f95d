"""Shared chip-timing discipline for every tools/bench_* script.

ONE definition of the hard-sync measurement (review finding: nine
copy-pasted variants risked the published docs/*.json numbers drifting
apart methodologically). The discipline, per PERF.md:

* hard sync — fetch an on-device reduction of the output over the RPC
  link; `block_until_ready` alone is unreliable under this environment's
  async tunnel dispatch;
* pipelined batches — `reps` dispatches back-to-back, synced once, so
  per-dispatch RPC latency amortizes;
* median of 3 batches — robust to the tunnel's bursty latency (a single
  short batch once read a 10 ms rung as 24 ms).
"""

import time as _time

import jax.numpy as jnp
import numpy as np

# Every bench tool pays first-compile on a single-core host; share the
# CLI's persistent XLA compile cache (see __main__._enable_compile_cache).
from relativisticraytracer_tpu.__main__ import _enable_compile_cache

_enable_compile_cache()


def timeit_hard(fn, reps: int = 5) -> float:
    """ms per call of `fn` (returns a device array), hard-synced.

    Syncs on an 8-element slice reduction: enough to force execution of
    the whole program, cheap enough (4 bytes over RPC after the sum) not
    to perturb the measurement.
    """
    np.asarray(jnp.sum(fn().ravel()[:8].astype(jnp.float32)))
    best = []
    for _ in range(3):
        t0 = _time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(jnp.sum(out.ravel()[:8].astype(jnp.float32)))
        best.append((_time.perf_counter() - t0) * 1000.0 / reps)
    return float(np.median(best))


def timeit_hard_scalar(fn, reps: int = 5) -> float:
    """Same discipline for an `fn` that already returns a device scalar
    (e.g. delta-method microbenchmarks that fold their own reduction)."""
    np.asarray(fn())
    best = []
    for _ in range(3):
        t0 = _time.perf_counter()
        for _ in range(reps):
            s = fn()
        np.asarray(s)
        best.append((_time.perf_counter() - t0) * 1000.0 / reps)
    return float(np.median(best))
