"""Device-accurate timing that works over remote/tunneled TPU platforms.

On tunneled platforms (e.g. the 'axon' plugin), jax.block_until_ready
can return before remote execution finishes, so wall-clock timing must
synchronize by fetching a (tiny) result to the host. `measure` amortizes
the fetch round trip over many chained iterations.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def sync(out) -> None:
    """Block until `out` (any pytree of arrays) is computed, by fetching
    a scalar reduction of one leaf."""
    leaves = jax.tree.leaves(out)
    if not leaves:
        return
    x = leaves[0]
    np.asarray(jnp.sum(jnp.ravel(x)[:1]))


def fetch_rtt() -> float:
    """Median host<->device scalar round-trip time."""
    z = jnp.zeros(())
    np.asarray(z + 0)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(z + 0)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure(fn: Callable[[int], object], iters: int = 5, warmup: int = 1) -> float:
    """True per-iteration MEDIAN seconds of `fn(i)`: every iteration is
    individually synchronized (host fetch of a scalar) and corrected for
    the fetch round trip. Use for headline latency numbers (a real p50).

    fn must return a device array pytree; iterations should differ in an
    argument (e.g. PRNG key index) so nothing is constant-folded.
    """
    for i in range(warmup):
        sync(fn(i))
    rtt = fetch_rtt()
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        sync(fn(1000 + i))
        ts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    return float(np.median(ts))


def measure_amortized(
    fn: Callable[[int], object], iters: int = 5, warmup: int = 1
) -> float:
    """MEAN per-iteration seconds: dispatches all iterations and syncs
    once at the end. Lower overhead than `measure` for very short ops
    (one fetch round trip total), but it is a mean, not a percentile.
    """
    for i in range(warmup):
        sync(fn(i))
    rtt = fetch_rtt()
    t0 = time.perf_counter()
    outs = [fn(1000 + i) for i in range(iters)]
    # Device execution is in-order: syncing the last output waits for
    # every dispatched iteration.
    sync(outs[-1])
    total = time.perf_counter() - t0 - rtt
    return max(total, 1e-9) / iters
