"""Distributed runtime: scheduler, mesh search, cross-host queue.

Re-exports resolve lazily (PEP 562): `mesh`, `sharded_search` and
`distributed` import jax at module scope, and a host-only maestro or
remote-queue run must not pay (or require) accelerator-runtime import
just to schedule builds.
"""

_LAZY = {
    "make_search_mesh": ".mesh",
    "ShardedDatabase": ".sharded_search",
    "build_sharded_groups": ".sharded_search",
    "search_sharded_groups": ".sharded_search",
    "sharded_search_counts": ".sharded_search",
    "sharded_search_complete": ".sharded_search",
    "sharded_search_files": ".sharded_search",
    "sharded_total_hits": ".sharded_search",
    "init_distributed": ".distributed",
    "make_global_search_mesh": ".distributed",
    "shard_inventory": ".distributed",
    "CoordinatorServer": ".remote",
    "RemoteWorker": ".remote",
    "run_distributed_maestro": ".remote",
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    try:
        modname = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    from importlib import import_module

    return getattr(import_module(modname, __name__), name)
