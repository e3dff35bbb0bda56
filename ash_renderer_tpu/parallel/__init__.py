from .sharding import render_frame_sharded, make_render_mesh  # noqa: F401
