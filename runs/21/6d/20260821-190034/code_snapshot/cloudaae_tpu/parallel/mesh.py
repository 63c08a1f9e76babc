"""Device mesh construction and sharding rules.

Mesh axes:
  dp — data parallel: batches are sharded along it; gradients all-reduce
       over ICI automatically under jit.
  tp — tensor parallel: the wide FC kernels (decoder 1024x3072 and head
       1024x512 layers) shard their output dimension; XLA/GSPMD inserts the
       matching collectives.  At this model size tp is headroom, not need
       (SURVEY.md §2.11) — dp is the default.

The same code runs single-chip (1x1 mesh) and multi-chip; tests exercise an
8-device virtual CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialize jax.distributed for multi-host meshes.

    On Cloud TPU pods the arguments auto-detect from the environment; pass
    them explicitly elsewhere.  After this, ``jax.devices()`` spans all
    hosts and ``make_mesh`` builds pod-wide meshes — gradient all-reduce
    rides ICI within a slice and DCN across slices with no further code
    (SURVEY.md §5.8).  No-op if already initialized.
    """
    if jax.process_count() > 1:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process environments


def make_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh; dp = -1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch on the mesh, sharded along dp on the leading axis."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def _param_spec(path: tuple[str, ...], leaf) -> P:
    """Partition rule for one parameter.

    Wide FC kernels shard their output dim over tp; the matching output
    biases shard too; everything else is replicated.  Layer names follow
    models/dgcnn.py: decoder/fc{1,2}, rot_head/fc*, trans_head/fc* hold the
    (1024, >=512) kernels worth sharding.
    """
    names = "/".join(path)
    is_wide_fc = (
        ("decoder/" in names or "rot_head/" in names or "trans_head/" in names)
        and "/dense/" in names
        and "_out/" not in names
    )
    if is_wide_fc and leaf.ndim == 2:
        return P(None, "tp")
    if is_wide_fc and leaf.ndim == 1:
        return P("tp")
    return P()


def shard_params(mesh: Mesh, params):
    """Apply the tp partition rules to a parameter pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return names

    def place(path, leaf):
        spec = _param_spec(spec_for(path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(mesh: Mesh, params):
    """The NamedSharding pytree matching :func:`shard_params`."""

    def spec(path, leaf):
        names = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        return NamedSharding(mesh, _param_spec(names, leaf))

    return jax.tree_util.tree_map_with_path(spec, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: tp-sharded wide FC kernels, everything
    else replicated (Adam moments stay replicated — GSPMD inserts the
    gathers around the tp layers)."""
    import dataclasses

    rep = replicated(mesh)
    put_rep = lambda tree: jax.tree.map(lambda x: jax.device_put(x, rep), tree)
    return dataclasses.replace(
        state,
        params=shard_params(mesh, state.params),
        batch_stats=put_rep(state.batch_stats),
        opt_state=put_rep(state.opt_state),
        step=jax.device_put(state.step, rep),
    )
