"""Drop-in import surface mirroring the reference's
``professad.functional_tools`` (reference: functional_tools.py:1-423).

Autodiff utilities, FFT/grid derivatives, density descriptors,
interpolation and the field-dependent convolution, re-exported from their
native homes in :mod:`professad_tpu.ops`.  The torch-era ``requires_grad``
keyword is dropped — every function here is a pure JAX function, so
compose with ``jax.grad`` / ``jax.jacfwd`` directly (docs/migration.md).
"""

from .ops.autodiff import (get_functional_derivative, get_inv_G, get_stress,
                           get_pressure)
from .ops.grid import (wavevecs, grad_i, grad_dot_grad, laplacian,
                       reduced_gradient, reduced_gradient_squared,
                       reduced_laplacian)
from .ops.interp import interpolate, interpolate_kernel
from .ops.fieldconv import (field_dependent_convolution,
                            field_dependent_convolution_naive, xi_ladder)

__all__ = [
    "get_functional_derivative", "get_inv_G", "get_stress", "get_pressure",
    "wavevecs", "grad_i", "grad_dot_grad", "laplacian",
    "reduced_gradient", "reduced_gradient_squared", "reduced_laplacian",
    "interpolate", "interpolate_kernel",
    "field_dependent_convolution", "field_dependent_convolution_naive",
    "xi_ladder",
]
