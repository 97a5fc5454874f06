"""Differentiable ground-state properties w.r.t. functional parameters.

Validates ``System.gs_property_fn`` — the JAX-native replacement for the
reference's ``energy(requires_grad=True)`` / ``density(requires_grad=True)``
training workflow (reference system.py:459-480, 361-375): gradients of
ground-state targets w.r.t. trainable-functional parameters must match
central finite differences of fully RE-OPTIMIZED ground states.
"""

import numpy as np
import jax
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, PauliGaussian,
                                  PerdewBurkeErnzerhof)
from paths import pot


def _fcc_al_pg(pg, shape=(10, 10, 10)):
    box_vecs = 4.05 * jnp.asarray([[0.5, 0.5, 0.0],
                                   [0.0, 0.5, 0.5],
                                   [0.5, 0.0, 0.5]])
    ions = [["Al", pot("al.gga.recpot"), jnp.zeros((1, 3))]]
    terms = [IonIon, IonElectron, Hartree, pg, PerdewBurkeErnzerhof]
    return System(box_vecs, shape, ions, terms, units="a",
                  coord_type="fractional")


def _gs_energy_at(params, shape=(10, 10, 10)):
    """Fresh system with the given PG params, fully optimized."""
    pg = PauliGaussian()
    pg.params = {k: jnp.asarray(v) for k, v in params.items()}
    s = _fcc_al_pg(pg, shape=shape)
    s.optimize_density(ntol=1e-12, n_maxiter=3000)
    return s


def test_gs_energy_grad_vs_fd():
    pg = PauliGaussian()
    p0 = {k: np.float64(v) for k, v in pg.params.items()}

    s = _gs_energy_at(p0)
    pg_term = next(t for t in s._terms if isinstance(t, PauliGaussian))
    fn = s.gs_property_fn(pg_term)

    E0 = float(fn(pg_term.params))
    assert np.isclose(E0, s.energy("Ha"), rtol=1e-12)  # sanity: same energy

    g = jax.grad(fn)(pg_term.params)

    eps = 3e-4
    for key in ("mu", "beta"):
        pp = dict(p0)
        pp[key] = p0[key] + eps
        Ep = _gs_energy_at(pp).energy("Ha")
        pm = dict(p0)
        pm[key] = p0[key] - eps
        Em = _gs_energy_at(pm).energy("Ha")
        fd = (Ep - Em) / (2.0 * eps)
        assert np.isclose(float(g[key]), fd, rtol=1e-3, atol=1e-9), \
            (key, float(g[key]), fd)


def test_gs_density_target_grad_vs_fd():
    """Gradient of a density-matching loss (the reference's
    density(requires_grad=True) training mode) vs finite differences."""
    pg = PauliGaussian()
    p0 = {k: np.float64(v) for k, v in pg.params.items()}

    s = _gs_energy_at(p0)
    den_target = jnp.asarray(np.asarray(s.density()) * 1.02)  # fake target

    def loss_at(params):
        s2 = _gs_energy_at(params)
        return float(jnp.mean((s2.density() - den_target) ** 2))

    pg_term = next(t for t in s._terms if isinstance(t, PauliGaussian))
    fn = s.gs_property_fn(
        pg_term, property_fn=lambda den, E: jnp.mean((den - den_target) ** 2))
    g = jax.grad(fn)(pg_term.params)

    eps = 3e-4
    pp = dict(p0)
    pp["mu"] = p0["mu"] + eps
    pm = dict(p0)
    pm["mu"] = p0["mu"] - eps
    fd = (loss_at(pp) - loss_at(pm)) / (2.0 * eps)
    assert np.isclose(float(g["mu"]), fd, rtol=5e-3, atol=1e-12), \
        (float(g["mu"]), fd)


def test_gs_pressure_and_bulk_modulus_grads_vs_fd():
    """Params-differentiable pressure / bulk modulus (the reference's
    pressure/bulk_modulus(requires_grad=True) training targets, system.py:
    499-566): values match the direct getters and parameter gradients match
    central finite differences of fully re-optimized ground states."""
    pg = PauliGaussian()
    p0 = {k: np.float64(v) for k, v in pg.params.items()}

    # 8^3 keeps the third-order nested-AD cost manageable (the physics of
    # the derivative identity is grid-size independent)
    shape = (8, 8, 8)
    s = _gs_energy_at(p0, shape=shape)
    pg_term = next(t for t in s._terms if isinstance(t, PauliGaussian))

    fn_P = s.gs_volume_property_fn(pg_term, property="pressure")
    fn_K = s.gs_volume_property_fn(pg_term, property="bulk_modulus")

    # values agree with the direct getters (up to the converged-gradient
    # residual: fn_P keeps the implicit d(chi*)/dV chain, the getter is pure
    # Hellmann-Feynman at the stored density — they differ by the residual
    # grad_chi E . dchi*/dV, ~1e-9 absolute at ntol=1e-12)
    P0 = float(fn_P(pg_term.params))
    K0 = float(fn_K(pg_term.params))
    assert np.isclose(P0, s.pressure("Ha/b3"), rtol=1e-4, atol=1e-8)
    assert np.isclose(K0, s.bulk_modulus("Ha/b3"), rtol=1e-4, atol=1e-8)

    gP = jax.grad(fn_P)(pg_term.params)
    gK = jax.grad(fn_K)(pg_term.params)

    eps = 3e-4
    for key in ("mu",):
        pp = dict(p0)
        pp[key] = p0[key] + eps
        sp = _gs_energy_at(pp, shape=shape)
        pm = dict(p0)
        pm[key] = p0[key] - eps
        sm = _gs_energy_at(pm, shape=shape)
        fd_P = (sp.pressure("Ha/b3") - sm.pressure("Ha/b3")) / (2.0 * eps)
        fd_K = (sp.bulk_modulus("Ha/b3") - sm.bulk_modulus("Ha/b3")) / (2.0 * eps)
        # tolerance floor set by the FD probe itself: P/K carry ~1e-9/1e-6
        # relative solver error, differenced over 2*eps that is ~1% of the
        # derivative scale.  3% still cleanly catches the 40%-class error
        # of a frozen-linearization implicit rule (see ops/implicit.py).
        assert np.isclose(float(gP[key]), fd_P, rtol=3e-2, atol=1e-10), \
            (key, float(gP[key]), fd_P)
        assert np.isclose(float(gK[key]), fd_K, rtol=3e-2, atol=1e-9), \
            (key, float(gK[key]), fd_K)


def test_gs_volume_property_fn_validates_inputs():
    import pytest

    s = _gs_energy_at({"mu": 40.0 / 27.0, "beta": 0.25,
                       "lamb": 0.0, "sigma": 0.0})
    pg_term = next(t for t in s._terms if isinstance(t, PauliGaussian))
    with pytest.raises(ValueError):
        s.gs_volume_property_fn(pg_term, property="entropy")
    with pytest.raises(ValueError):
        s.gs_volume_property_fn(PauliGaussian())


def test_gs_property_fn_rejects_foreign_functional():
    import pytest

    s = _gs_energy_at({"mu": 40.0 / 27.0, "beta": 0.25,
                       "lamb": 0.0, "sigma": 0.0})
    with pytest.raises(ValueError):
        s.gs_property_fn(PauliGaussian())  # not one of s's terms
