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


def make_per_guide_tally(mesh: Mesh, n_guides: int,
                         axis_name: str = SCENE_AXIS):
    """Device-side per-guide ensemble statistics (SURVEY §2.3 item 3b).

    (win_idx (n,) int32 guide index per scene — -1 for scenes without
    attribution —, success (n,) int32) sharded on the scenes axis ->
    (wins (H,), successes_when_winning (H,), total_successes ()) psum-reduced
    across the mesh; identical on every shard.  This is the multi-chip form
    of the reference's host tally (infer_serial.py:167) extended with the
    per-guide breakdown; sweep.summary() sources its per-guide table from
    this reduction when a mesh is present.
    """

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis_name), P(axis_name)),
             out_specs=(P(), P(), P()))
    def tally(win_idx, success):
        onehot = (win_idx[:, None] ==
                  jnp.arange(n_guides)[None, :]).astype(jnp.int32)
        wins = jax.lax.psum(jnp.sum(onehot, axis=0), axis_name)
        succ = jax.lax.psum(jnp.sum(onehot * success[:, None], axis=0),
                            axis_name)
        total = jax.lax.psum(jnp.sum(success), axis_name)
        return wins, succ, total

    return tally


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
