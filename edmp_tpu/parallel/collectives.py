"""Thin collectives layer with mesh-axis names (SURVEY.md §2.3 item 3).

The sweep's hot path needs no hand-written collectives (pure data parallel),
but cross-shard reductions are exposed here for the cases that do:
per-guide/global success statistics (psum) and best-trajectory selection
across shards (argmin-reduce as a (cost, index) tuple min).  The same code
runs on 1 chip, a virtual CPU mesh, or a multi-host slice — XLA maps the
reductions onto ICI/DCN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from edmp_tpu.parallel.mesh import SCENE_AXIS


def psum_scalar(x, axis_name: str = SCENE_AXIS):
    return jax.lax.psum(x, axis_name)


def argmin_reduce(costs, values, axis_name: str = SCENE_AXIS):
    """Global best across shards inside a shard_map/pmap region.

    costs : (k,) local candidate costs, values : (k, ...) local payloads.
    Returns (best_cost, best_value) identical on every shard.
    """
    local_i = jnp.argmin(costs)
    local_cost = costs[local_i]
    local_val = values[local_i]
    all_costs = jax.lax.all_gather(local_cost, axis_name)   # (n_shards,)
    all_vals = jax.lax.all_gather(local_val, axis_name)     # (n_shards, ...)
    best = jnp.argmin(all_costs)
    return all_costs[best], all_vals[best]


def make_success_reducer(mesh: Mesh, axis_name: str = SCENE_AXIS):
    """(local bool successes,) -> global success count, via psum on the mesh."""

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis_name),
             out_specs=P())
    def reduce(successes):
        return jax.lax.psum(jnp.sum(successes.astype(jnp.int32)), axis_name)

    return reduce


def make_global_best(mesh: Mesh, axis_name: str = SCENE_AXIS):
    """Sharded (costs (B,), trajs (B, N, C)) -> global (cost, traj).

    The multi-chip equivalent of the reference's single-device argmin
    (lib/guide.py:648) when one scene's ensemble spans several chips.
    """

    # check_vma=False: the (all_gather -> argmin -> dynamic index) pattern is
    # replicated by construction, but the static checker can't prove it.
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis_name), P(axis_name)),
             out_specs=(P(), P()), check_vma=False)
    def best(costs, trajs):
        return argmin_reduce(costs, trajs, axis_name)

    return best
