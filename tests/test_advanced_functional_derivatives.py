"""Directional-derivative checks for the advanced nonlocal functionals.

The reference test suite validates potentials only for the WT family, LKT,
PG and the XC terms (tests/test_functional_derivative.py parity); the
heavier machinery — WGC99's kernel series, Foley-Madden's quadratic
response, KGAP, Huang-Carter's field-dependent convolution, MGP, XWM — is
only exercised through linear response.  Here every one of them gets an
autodiff-vs-finite-difference directional derivative test:

    d/dt E(den + t u) |_{t=0}  ==  <grad E, u>

on a smooth periodic density (16^3, f64), rtol 1e-6 with a 3-point stencil.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from professad_tpu.models import (WangGovindCarter99, FoleyMadden, KGAP,
                                  HuangCarter, RevisedHuangCarter,
                                  MiGenovaPavanello, XuWangMa, vWGTF1,
                                  vWGTF2, YukawaGGA)

SHAPE = (16, 16, 16)
BOX = 7.7


def _smooth_density(seed=0, n_mean=0.03):
    """Strictly positive, band-limited periodic density."""
    rng = np.random.default_rng(seed)
    spec = np.zeros(SHAPE, dtype=complex)
    spec[:3, :3, :3] = rng.normal(size=(3, 3, 3)) + 1j * rng.normal(size=(3, 3, 3))
    bumps = np.real(np.fft.ifftn(spec))
    bumps = bumps / np.max(np.abs(bumps))
    return jnp.asarray(n_mean * (1.0 + 0.4 * bumps))


def _functionals():
    hc = HuangCarter((0.01177, 0.7143, 1.2))
    rhc = RevisedHuangCarter((0.45, 0.10, 0.7143, 1.2))
    mgp = MiGenovaPavanello((0.2, 0.1))
    yk = YukawaGGA()
    yk.set_yuk2()
    return [
        ("vWGTF1", vWGTF1),
        ("vWGTF2", vWGTF2),
        ("WGC99", WangGovindCarter99()),
        ("FoleyMadden", FoleyMadden()),
        ("KGAP", lambda b, d: KGAP(b, d, 1.17)),
        ("HuangCarter", hc),
        ("RevisedHuangCarter", rhc),
        ("MGP", mgp),
        ("XWM", lambda b, d: XuWangMa(b, d, 0.01)),
        ("Yukawa-yuk2", yk),
    ]


@pytest.mark.parametrize("name,functional", _functionals(),
                         ids=[n for n, _ in _functionals()])
def test_directional_derivative(name, functional):
    box_vecs = BOX * jnp.eye(3)
    den = _smooth_density()
    # exactly zero-mean direction: several functionals deliberately detach
    # the mean density (reference functionals.py:634 `.item()`), so a
    # mean-carrying perturbation probes terms excluded from the gradient
    u = _smooth_density(seed=1, n_mean=1.0) - 1.0
    u = u - jnp.mean(u)

    owner = getattr(functional, "__self__", functional)
    prep = getattr(owner, "prepare", None)
    if callable(prep):
        prep(box_vecs, den)

    E = lambda d: functional(box_vecs, d)
    g = jax.grad(E)(den)
    ad = float(jnp.vdot(g, u))

    eps = 1e-6
    fd = float((E(den + eps * u) - E(den - eps * u)) / (2 * eps))
    assert np.isclose(ad, fd, rtol=1e-6), (name, ad, fd)


@pytest.mark.parametrize("name,functional", _functionals(),
                         ids=[n for n, _ in _functionals()])
def test_f32_tier_energy_and_gradient(name, functional):
    """The f32 (TPU) tier of every advanced functional evaluates and
    differentiates, and stays close to the f64 value.  Measured after the
    round-3 powr upgrade (general concrete exponents take the compensated
    exp_hp/log_hp route): energies within 8e-8 relative, gradients within
    4.2e-6 relative L2 across the whole family — the asserted bounds leave
    >20x headroom for platform FFT-rounding differences.  (Round-2 bars
    were 5e-5 / 5e-3: the HC-family ``den ** beta`` went through the
    approximate pow.)"""
    box_vecs = BOX * jnp.eye(3)
    den = _smooth_density()

    owner = getattr(functional, "__self__", functional)
    prep = getattr(owner, "prepare", None)
    if callable(prep):
        prep(box_vecs, den)
    E64 = float(functional(box_vecs, den))
    g64 = np.asarray(jax.grad(lambda d: functional(box_vecs, d))(den),
                     np.float64)

    b32 = box_vecs.astype(jnp.float32)
    d32 = den.astype(jnp.float32)
    if callable(prep):
        prep(b32, d32)
    E32 = float(functional(b32, d32))
    g32 = np.asarray(jax.grad(lambda d: functional(b32, d))(d32), np.float64)

    assert abs(E32 - E64) / abs(E64) < 2e-6, (name, E32, E64)
    rel = np.linalg.norm(g32 - g64) / np.linalg.norm(g64)
    assert rel < 1e-4, (name, rel)
