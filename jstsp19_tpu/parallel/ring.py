"""Ring collectives over the device mesh (``jax.lax.ppermute``).

The reference scales by running independent MATLAB workers and averaging
at the end (no committed comm backend); SURVEY §2.6 lists a ring/pipeline
schedule as the optional distributed-communication component.  The
TPU-native form is a ppermute ring over the ICI links: each step sends
the local partial to the next neighbour and accumulates, so after N−1
hops every device holds the full reduction without a logarithmic tree or
a host gather.  XLA lowers ``ppermute`` to neighbour ICI transfers, which
is exactly the physical ring of a TPU pod slice.

Two entry points:

- :func:`ring_allreduce_mean` — drop-in replacement for the
  ``psum``-based Monte-Carlo mean of ``harness/runner.py`` (equality
  tested against ``psum`` on the virtual mesh);
- :func:`ring_pipeline_map` — the pipeline schedule: a double-buffered
  scan that rotates shards around the ring while overlapping each hop
  with local compute (the classic all-gather-overlap pattern used to
  stream sweep points through the mesh without a global barrier).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def ring_allreduce_mean(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Mean of ``x`` over ``axis_name`` via an N−1-hop ppermute ring.

    Numerically equal to ``psum(x)/N`` up to f32 summation order; each
    hop is a single neighbour ICI transfer.
    """
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def hop(carry, _):
        acc, buf = carry
        buf = jax.lax.ppermute(buf, axis_name, perm)
        return (acc + buf, buf), None

    (acc, _), _ = jax.lax.scan(hop, (x, x), None, length=n - 1)
    return acc / n


def ring_pipeline_map(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    axis_name: str,
) -> jnp.ndarray:
    """Apply ``fn`` to every device's shard of ``x`` on every device,
    pipelined around the ring.

    At step k each device computes ``fn`` on the shard that originated
    k hops upstream while simultaneously forwarding the buffer — the
    send/recv of step k+1 overlaps the compute of step k (XLA schedules
    the independent ppermute and fn in parallel).  Returns the stacked
    results in origin order, shape ``(n, *fn_out.shape)`` — the
    all-gather-then-map result without ever materializing the gather.
    """
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    me = jax.lax.axis_index(axis_name)

    def step(buf, k):
        y = fn(buf)
        buf = jax.lax.ppermute(buf, axis_name, perm)
        # buf at step k originated at device (me - k) mod n
        return buf, (y, (me - k) % n)

    _, (ys, origins) = jax.lax.scan(step, x, jnp.arange(n))
    # reorder the time-ordered results into origin order
    order = jnp.argsort(origins)
    return jnp.take(ys, order, axis=0)


def mc_mean_ring(errs: jnp.ndarray, axis_name: str = "mc") -> jnp.ndarray:
    """Monte-Carlo mean of per-realization errors, ring-reduced over the
    ``mc`` mesh axis (the runner's default is ``psum``; this backend
    trades one log-tree collective for N−1 neighbour hops, which on a
    physical ring topology is the bandwidth-optimal schedule)."""
    return ring_allreduce_mean(jnp.mean(errs, axis=0), axis_name)


__all__ = ["ring_allreduce_mean", "ring_pipeline_map", "mc_mean_ring"]
