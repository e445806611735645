from . import image, losses, math3d, sh  # noqa: F401
