from .mesh import make_search_mesh
from .sharded_search import (
    ShardedDatabase,
    build_sharded_groups,
    search_sharded_groups,
    sharded_search_counts,
    sharded_search_complete,
    sharded_search_files,
    sharded_total_hits,
)
from .distributed import init_distributed, make_global_search_mesh, shard_inventory
from .remote import CoordinatorServer, RemoteWorker, run_distributed_maestro
