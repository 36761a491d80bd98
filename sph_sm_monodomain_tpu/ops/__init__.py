from . import (electrophysiology, grid, integrate, kernels, linalg,
               shape_matching, sph)

__all__ = ["electrophysiology", "grid", "integrate", "kernels", "linalg",
           "shape_matching", "sph"]
