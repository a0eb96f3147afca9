from gvr_tpu.parallel.sharding import (
    make_mesh,
    shard_rays,
    sharded_render_fn,
)

__all__ = ["make_mesh", "shard_rays", "sharded_render_fn"]
