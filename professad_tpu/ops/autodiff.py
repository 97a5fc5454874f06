"""Autodiff utilities for functional derivatives, linear response, stress, pressure.

TPU-native rebuild of /root/reference/src/professad/functional_tools.py:9-127,
with ``torch.autograd.grad`` replaced by ``jax.grad`` closures.  All returned
quantities are further differentiable by construction (JAX traces compose),
so there is no ``requires_grad`` plumbing.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .grid import wavevecs, volume, safe_sqrt

__all__ = ["get_functional_derivative", "get_inv_G", "get_stress", "get_pressure"]


def get_functional_derivative(box_vecs, den, functional):
    """delta F / delta n(r) via one reverse-mode pass, normalized by the
    grid quadrature weight vol/N_grid (parity: functional_tools.py:9-31)."""
    g = jax.grad(lambda n: functional(box_vecs, n))(den)
    return g / (volume(box_vecs) / den.size)


def get_inv_G(box_vecs, den, kinetic_functional):
    """Linear response G^{-1}(eta) of a kinetic functional about the uniform
    density, via two nested autodiff passes (parity: functional_tools.py:34-70).

    Returns (eta, G_inv) on the rfftn half-spectrum grid.
    """
    vol = volume(box_vecs)
    _, _, _, k2 = wavevecs(box_vecs, den.shape)
    N_elec = round(float(jnp.mean(den) * vol))
    n0 = jnp.full(den.shape, N_elec / vol, dtype=den.dtype)
    k_F = (3.0 * np.pi**2 * N_elec / vol) ** (1.0 / 3.0)

    # functionals with data-dependent kernels (Yukawa/HC/MGP) cache a static
    # ladder from the concrete uniform density before we trace the grads
    owner = getattr(kinetic_functional, "__self__", kinetic_functional)
    prep = getattr(owner, "prepare", None)
    if callable(prep):
        prep(box_vecs, n0)

    def dTdn_000(n):
        g = jax.grad(lambda m: kinetic_functional(box_vecs, m))(n)
        return (g / (vol / n.size))[0, 0, 0]

    d2T = jax.grad(dTdn_000)(n0)
    G_inv = np.pi**2 / k_F / jnp.fft.rfftn(d2T).real
    eta = safe_sqrt(k2) / (2.0 * k_F)
    return eta, G_inv


def get_stress(box_vecs, den, functional):
    """Functional contribution to stress sigma = (dF/dh)^T h / vol, with the
    density rescaled by vol to encode the fixed-electron-number constraint
    (parity: functional_tools.py:73-101)."""
    vol0 = jax.lax.stop_gradient(volume(box_vecs))

    def F(h):
        return functional(h, den * vol0 / volume(h))

    dEdcell = jax.grad(F)(box_vecs).T
    return dEdcell @ box_vecs / vol0


def get_pressure(box_vecs, den, functional):
    """Functional contribution to pressure P = -dF/dvol at fixed electron
    number (parity: functional_tools.py:104-127)."""
    vol0 = jax.lax.stop_gradient(volume(box_vecs))

    def F(v):
        scale = (v / vol0) ** (1.0 / 3.0)
        return functional(box_vecs * scale, den * vol0 / v)

    return -jax.grad(F)(vol0)
