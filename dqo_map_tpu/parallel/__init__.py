from .dp import dp_optimize_step, make_mesh  # noqa: F401
