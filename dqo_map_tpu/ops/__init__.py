from .rasterize import RenderSettings, rasterize  # noqa: F401
