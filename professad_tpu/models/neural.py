"""Neural-network kinetic functional: an MLP Pauli enhancement factor.

TPU-native counterpart of the reference's neural-network-functional tutorial
(/root/reference/tutorial_examples/parameterized_functionals/
neural_network_functional.py), promoted to a library model family: a
semi-local functional T = T_vW + mean(F_theta(s, q) * tau_TF) * vol where
F_theta is a small MLP over the reduced density descriptors.

TPU design notes:

* Parameters are a plain dict-of-arrays pytree (gradients from ``jax.grad``
  over ``apply``; optimizer from optax via the KineticFunctional template).
* The descriptor stack (..., 2) @ (2, H) contraction maps onto the MXU; the
  whole enhancement-factor evaluation fuses with the Thomas-Fermi integrand
  under XLA.
* SiLU hidden activations, softplus output (F >= 0 — Pauli positivity), same
  functional form as the reference tutorial.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid import (wavevecs, volume, qmean, reduced_gradient,
                        reduced_laplacian)
from .base import KineticFunctional
from .kinetic_local import Weizsaecker, TF_COEFF

__all__ = ["NeuralNetworkFunctional"]


class NeuralNetworkFunctional(KineticFunctional):
    """T = T_vW + int F_theta(s, q) tau_TF; F_theta = softplus MLP."""

    def __init__(self, init_args=None, seed=0):
        super().__init__(init_args)
        inner = list(init_args) if init_args is not None else [16, 16]
        self.init_args = inner
        sizes = [2] + inner + [1]
        rng = np.random.default_rng(seed)
        params = {}
        for i in range(len(sizes) - 1):
            fan_in = sizes[i]
            params[f"W{i}"] = jnp.asarray(
                rng.normal(size=(sizes[i], sizes[i + 1]))
                / np.sqrt(fan_in))
            params[f"b{i}"] = jnp.zeros((sizes[i + 1],))
        self.params = params
        self.n_layers = len(sizes) - 1
        self.initialize()

    def enhancement_factor(self, params, s, q):
        """F_theta(s, q) >= 0 on the grid."""
        h = jnp.stack([s, q], axis=-1)
        for i in range(self.n_layers):
            h = h @ params[f"W{i}"] + params[f"b{i}"]
            if i != self.n_layers - 1:
                h = jax.nn.silu(h)
        return jax.nn.softplus(h[..., 0])

    def apply(self, params, box_vecs, den):
        kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
        s = reduced_gradient(kx, ky, kz, den)
        q = reduced_laplacian(k2, den)
        F_enh = self.enhancement_factor(params, s, q)
        TF_ked = TF_COEFF * den ** (5.0 / 3.0)
        pauli_T = qmean(F_enh * TF_ked) * volume(box_vecs)
        return Weizsaecker(box_vecs, den) + pauli_T
