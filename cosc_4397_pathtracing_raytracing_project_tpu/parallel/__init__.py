from .mesh import PIXEL_AXIS, SAMPLE_AXIS, make_mesh, pixel_sharding, replicated
from .shard import make_sharded_step, render_chunk_sharded

__all__ = [
    "PIXEL_AXIS",
    "SAMPLE_AXIS",
    "make_mesh",
    "pixel_sharding",
    "replicated",
    "make_sharded_step",
    "render_chunk_sharded",
]
