from .mesh import make_search_mesh
from .sharded_search import ShardedDatabase, sharded_search_counts, sharded_search_complete
from .distributed import init_distributed, make_global_search_mesh, shard_inventory
