"""Implicit differentiation through the density-optimization ground state.

TPU-native replacement for the reference's xitorch trick
(/root/reference/src/professad/system.py:1204-1223): there, an already
converged chi is wrapped in ``xitorch.optimize.minimize(..., maxiter=0)``
whose custom backward applies the implicit function theorem at the minimum.

Here we use ``jax.lax.custom_root``: the "solve" is the identity (chi is
already converged by the L-BFGS optimizer), and the tangent solve inverts the
energy Hessian in chi with conjugate gradients (Hessian-vector products via
forward-over-reverse autodiff; CG itself is built on
``lax.custom_linear_solve`` so the whole construction is differentiable to
higher order — forces, stresses, elastic constants and force constants of the
*ground state* all flow through this one primitive).

Gauge note: the chi-parameterization n = N chi^2 / int chi^2 is scale
invariant, so the Hessian has an exact zero mode along chi.  We project it
out of the right-hand side and add a rank-one shift along chi to keep CG
well-conditioned; gauge-invariant outputs are unaffected.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["implicit_ground_state"]


def _tangent_solve_factory(chi_opt, cg_tol, cg_maxiter):
    chihat = chi_opt / jnp.linalg.norm(chi_opt)

    def tangent_solve(g, y):
        # g: linearized residual (the Hessian applied to a tangent), y: rhs
        yp = y - jnp.vdot(chihat, y) * chihat
        # scale estimate for the rank-one regularizer from one matvec
        Hy = g(yp)
        c = jnp.abs(jnp.vdot(yp, Hy)) / (jnp.vdot(yp, yp) + 1e-300) + 1e-300

        def matvec(u):
            return g(u) + c * jnp.vdot(chihat, u) * chihat

        u, _ = jax.scipy.sparse.linalg.cg(matvec, yp, tol=cg_tol,
                                          maxiter=cg_maxiter)
        return u - jnp.vdot(chihat, u) * chihat

    return tangent_solve


def implicit_ground_state(energy_fn, chi_opt, args=(), cg_tol=1e-12,
                          cg_maxiter=500):
    """Mark a converged chi as the stationary point of ``energy_fn``.

    Args:
      energy_fn: pure function (chi, *args) -> scalar energy, where chi is
                 the unconstrained sqrt-density variable.
      chi_opt:   converged chi (gradients "through the optimizer" are taken
                 at this point via the implicit function theorem).
      args:      differentiable extra arguments (box vectors, volume, ionic
                 coordinates, functional parameters, ...).

    Returns:
      chi with implicit-differentiation semantics: downstream jax.grad /
      jax.jacfwd w.r.t. ``args`` (closed over via this call's return value)
      sees d chi*/d args from the IFT.
    """
    chi_opt = jax.lax.stop_gradient(chi_opt)

    def residual(chi):
        return jax.grad(energy_fn)(chi, *args)

    def solve(f, x0):
        return x0

    return jax.lax.custom_root(
        residual, chi_opt, solve,
        _tangent_solve_factory(chi_opt, cg_tol, cg_maxiter))
