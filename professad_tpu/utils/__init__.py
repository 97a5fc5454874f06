from . import constants  # noqa: F401
from .crystal import get_cell  # noqa: F401
from .elastic import (fit_eos, voigt_moduli, reuss_moduli, shear_average,  # noqa: F401
                      poissons_ratio, youngs_modulus)
from .profiling import trace, annotate, StepTimer  # noqa: F401
