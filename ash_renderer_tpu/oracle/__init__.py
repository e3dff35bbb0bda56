from .raster_cpu import geometry_oracle, visibility_oracle, render_oracle  # noqa: F401
