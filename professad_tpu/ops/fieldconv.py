"""Field-dependent convolution via the xi-ladder spline method.

Computes K(r) = integral d3r' f(|r - r'|, xi(r)) g(r') in quasi-linear time:
evaluate the convolution for a sparse ladder of constant-xi kernels with ONE
batched 4-D FFT, then cubic-Hermite interpolate along the ladder axis at the
spatially varying xi(r).

TPU-native rebuild of /root/reference/src/professad/functional_tools.py:381-423.
The batched (n1, n2, n3, n_xi) inverse FFT over axes (0, 1, 2) is a natural
TPU fit: XLA batches the transforms over the trailing ladder axis.

JAX static-shape note: the reference sizes the ladder from runtime min/max of
xi(r) (data-dependent shapes, functional_tools.py:406-419).  Here the ladder
construction is factored out (``xi_ladder``, host-side) so callers inside
``jit``/``while_loop`` can pass a precomputed static ladder; the eager wrapper
reproduces the reference behaviour exactly.
"""

import numpy as np
import jax.numpy as jnp

from .interp import interpolate_kernel

__all__ = ["xi_ladder", "field_dependent_convolution"]


def xi_ladder(xi_min, xi_max, kappa, mode="arithmetic"):
    """Sparse xi ladder covering [xi_min, xi_max] with margin (host-side numpy).

    Parity: functional_tools.py:406-419.
    """
    xi_min = float(xi_min)
    xi_max = float(xi_max)
    if mode == "arithmetic":
        lower = (np.floor(xi_min / kappa) - 3) * kappa
        upper = (np.ceil(xi_max / kappa) + 3) * kappa
        xi_sparse = np.arange(lower, upper, kappa, dtype=np.float64)
        xi_sparse[xi_sparse == 0] = xi_min
    elif mode == "geometric":
        if not kappa > 1:
            raise ValueError("kappa > 1 required for geometric-progression ladder")
        lower = kappa ** (-(np.ceil(-np.log(xi_min) / np.log(kappa)) + 3))
        N = int(np.ceil(np.log((xi_max + 1) / lower) / np.log(kappa)) + 3)
        xi_sparse = lower * kappa ** np.arange(N, dtype=np.float64)
    else:
        raise ValueError("mode must be 'arithmetic' or 'geometric'")
    return xi_sparse


def field_dependent_convolution(k, f_tilde, g, xis, kappa=None, mode="arithmetic",
                                xi_sparse=None):
    """K(r) = int d3r' f(|r-r'|, xi(r)) g(r') via the spline method.

    Args:
      k:        wavevector magnitude (or k^2, per the kernel's convention) on
                the rfftn half-spectrum grid, shape (m1, m2, m3).
      f_tilde:  callable (k, xi_sparse) -> (m1, m2, m3, n_xi); the Fourier
                transform of the kernel at each constant ladder value.
      g:        (n1, n2, n3) real-space field to convolve.
      xis:      (n1, n2, n3) spatially varying xi(r).
      kappa:    ladder spacing (arithmetic) or ratio (geometric).  Used only
                when ``xi_sparse`` is not supplied.
      mode:     'arithmetic' or 'geometric' ladder progression.
      xi_sparse: optional precomputed static ladder (enables use under jit).

    Parity: functional_tools.py:381-423.
    """
    if xi_sparse is None:
        xi_sparse = xi_ladder(jnp.min(xis), jnp.max(xis), kappa, mode)
    xi_sparse = jnp.asarray(xi_sparse, dtype=g.dtype)
    g_tilde = jnp.fft.rfftn(g)[..., None]
    conv = jnp.fft.irfftn(f_tilde(k, xi_sparse) * g_tilde, s=g.shape, axes=(0, 1, 2))
    return interpolate_kernel(xi_sparse, conv, xis)
