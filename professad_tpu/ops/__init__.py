from . import grid, interp, fieldconv, autodiff  # noqa: F401
