"""PROFESS-AD-TPU: a TPU-native, JAX auto-differentiable orbital-free DFT library.

Rebuild of profess-dev/profess-ad (PyTorch) as an idiomatic JAX/XLA
package: plane-wave energy functionals over batched 3-D FFTs, functional
derivatives / forces / stresses via ``jax.grad``, a ``lax.while_loop``
L-BFGS density optimizer compiled as one XLA program, and implicit
differentiation through the ground state for second-order properties.

Precision policy: float64 is enabled globally (the physics and the reference
test tolerances demand it).  The correctness tier runs in f64; the TPU fast
path casts to f32 (TPU FFT has no f64 kernel) with f64 scalars where cheap.
"""

import os

# Enable x64 before any jax.numpy array is created.  Users can opt out by
# setting PROFESSAD_TPU_NO_X64=1 before importing.
if not os.environ.get("PROFESSAD_TPU_NO_X64"):
    import jax
    jax.config.update("jax_enable_x64", True)

from .ops.grid import (wavevecs, grad_i, grad_dot_grad, laplacian,
                       reduced_gradient, reduced_gradient_squared,
                       reduced_laplacian)
from .ops.interp import interpolate, interpolate_kernel
from .ops.fieldconv import field_dependent_convolution, xi_ladder
from .ops.autodiff import (get_functional_derivative, get_inv_G, get_stress,
                           get_pressure)
from .system import System
from .utils.crystal import get_cell
from .utils.elastic import fit_eos

__version__ = "0.1.0"
