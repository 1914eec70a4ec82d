from .overlap_shard import ShardedOverlapEngine  # noqa: F401
