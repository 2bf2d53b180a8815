from .mesh import make_mesh, shard_batch, replicate_tables
