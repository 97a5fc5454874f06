"""Local and semi-local (GGA-type) kinetic energy functionals.

TPU-native rebuild of /root/reference/src/professad/functionals.py:207-607:
Thomas-Fermi, von Weizsaecker, vWGTF1/2, Luo-Karasiev-Trickey, the trainable
Pauli-Gaussian family and the Yukawa-GGA family.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid import (wavevecs, volume, laplacian, safe_sqrt, qmean, wmean,
                        reduced_gradient, reduced_gradient_squared,
                        reduced_laplacian, powr)
from ..ops.fieldconv import (field_dependent_convolution,
                             field_dependent_convolution_naive, xi_ladder)
from .base import KineticFunctional

__all__ = [
    "ThomasFermi", "Weizsaecker", "vWGTF1", "vWGTF2", "LuoKarasievTrickey",
    "PauliGaussian", "YukawaGGA", "TF_COEFF",
]

TF_COEFF = 0.3 * (3.0 * np.pi**2) ** (2.0 / 3.0)


def ThomasFermi(box_vecs, den):
    """T_TF = c_TF int n^{5/3} (parity: functionals.py:207-224)."""
    return TF_COEFF * qmean(powr(den, 5.0 / 3.0)) * volume(box_vecs)


def Weizsaecker(box_vecs, den):
    """T_vW = 1/8 int |grad n|^2 / n, evaluated Laplacian-form as
    1/4 lap n - 1/2 sqrt(n) lap sqrt(n) (parity: functionals.py:227-246)."""
    sqrt_den = safe_sqrt(den)
    _, _, _, k2 = wavevecs(box_vecs, den.shape)
    ked = 0.25 * laplacian(k2, den) - 0.5 * sqrt_den * laplacian(k2, sqrt_den)
    return qmean(ked) * volume(box_vecs)


def _mean_density(box_vecs, den):
    """n0 = N_e / vol with N_e rounded & detached (functionals.py:269-271)."""
    vol = volume(box_vecs)
    N_elec = jnp.round(jax.lax.stop_gradient(wmean(den) * vol))
    return N_elec / vol


def vWGTF1(box_vecs, den):
    """vWGTF1: G(d) = 0.9892 d^{-1.2994} (parity: functionals.py:251-274)."""
    d = den / _mean_density(box_vecs, den)
    G = 0.9892 * powr(d, -1.2994)
    TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
    return Weizsaecker(box_vecs, den) + qmean(G * TF_ked) * volume(box_vecs)


def vWGTF2(box_vecs, den):
    """vWGTF2: ELF-parameterized enhancement (parity: functionals.py:277-305)."""
    d = den / _mean_density(box_vecs, den)
    ELF = 0.5 * (1.0 + jnp.tanh(5.7001 * powr(d, 0.2563) - 5.7001))
    G = jnp.sqrt(1.0 / ELF - 1.0)
    TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
    return Weizsaecker(box_vecs, den) + qmean(G * TF_ked) * volume(box_vecs)


def LuoKarasievTrickey(box_vecs, den):
    """LKT GGA: F_theta = 1/cosh(1.3 s), s clamped at 100 against NaN grads
    (parity: functionals.py:309-331)."""
    TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
    s = jnp.minimum(reduced_gradient(kx, ky, kz, den), 100.0)
    F_pauli = 1.0 / jnp.cosh(1.3 * s)
    pauli_T = qmean(TF_ked * F_pauli) * volume(box_vecs)
    return Weizsaecker(box_vecs, den) + pauli_T


class PauliGaussian(KineticFunctional):
    """Pauli-Gaussian family: F = e^{-mu s^2} + beta q^2 - lambda q s^2 + sigma s^4
    (parity: functionals.py:336-401).  Defaults to PGSL0.25."""

    def __init__(self, init_args=None):
        super().__init__(init_args)
        if init_args is None:
            mu, beta, lamb, sigma = 40.0 / 27.0, 0.25, 0.0, 0.0
        else:
            mu, beta, lamb, sigma = init_args
        self.params = {
            "mu": jnp.asarray(float(mu)),
            "beta": jnp.asarray(float(beta)),
            "lamb": jnp.asarray(float(lamb)),
            "sigma": jnp.asarray(float(sigma)),
        }
        self.initialize()

    def _set(self, mu, beta, lamb, sigma):
        self.params = {"mu": jnp.asarray(mu), "beta": jnp.asarray(beta),
                       "lamb": jnp.asarray(lamb), "sigma": jnp.asarray(sigma)}

    def set_PG1(self):
        self._set(1.0, 0.0, 0.0, 0.0)

    def set_PGS(self):
        self._set(40.0 / 27.0, 0.0, 0.0, 0.0)

    def set_PGSL025(self):
        self._set(40.0 / 27.0, 0.25, 0.0, 0.0)

    def set_PGSLr(self):
        self._set(40.0 / 27.0, 0.25, 0.4, 0.2)

    def apply(self, params, box_vecs, den):
        TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
        kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
        s2 = reduced_gradient_squared(kx, ky, kz, den)
        q = reduced_laplacian(k2, den)
        F_enh = (jnp.exp(-jnp.abs(params["mu"]) * s2)
                 + jnp.abs(params["beta"]) * q * q
                 - jnp.abs(params["lamb"]) * q * s2
                 + jnp.abs(params["sigma"]) * s2 * s2)
        pauli_T = qmean(TF_ked * F_enh) * volume(box_vecs)
        return Weizsaecker(box_vecs, den) + pauli_T


def _T_a(a, x):
    """T_a(x) = 1 + (2/a) tanh(a x / 2) (parity: functionals.py:477-478)."""
    return 1.0 + (2.0 / a) * jnp.tanh((a / 2.0) * x)


class YukawaGGA(KineticFunctional):
    """Yukawa-GGA family: Pauli factor F(y, s^2, q) built on the Yukawa
    potential descriptor, evaluated with the spline field-dependent
    convolution (parity: functionals.py:406-607).

    JAX note: the xi ladder needs concrete density bounds.  ``prepare()``
    caches a static ladder from a concrete density so that ``forward`` can be
    traced (jit / grad); eager calls size the ladder on the fly like the
    reference.
    """

    def __init__(self, init_args=None):
        super().__init__(init_args)
        if init_args is None:
            alpha, beta, func, kappa = 1.0, 1.0, (lambda y, s2, q: y), 1.2
            self._preset = ("yuk1",)   # the default F = y IS yuk1's form
        else:
            alpha, beta, func, kappa = init_args
            self._preset = None        # user callable: autodiff-only
        self.params = {"alpha": jnp.asarray(float(alpha)),
                       "beta": jnp.asarray(float(beta))}
        self.F_pauli = func
        self.kappa = kappa
        self.mode = "geometric"
        self.spline = True
        self.xi_sparse = None
        self.ladder_margin = 1.0
        self.initialize()

    # -- preset parameterizations (parity: functionals.py:480-589) ------
    # each setter tags the instance (self._preset) so the fused analytic
    # potential (models/potentials.py _vp_yukawa) can select the matching
    # closed-form F partials; custom F_pauli callables clear the tag.
    def set_yuk1(self):
        self.params["alpha"] = jnp.asarray(1.0)
        self.params["beta"] = jnp.asarray(1.0)
        self.F_pauli = lambda y, s2, q: y
        self._preset = ("yuk1",)

    def set_yuk2(self):
        self.params["alpha"] = jnp.asarray(1.3629)
        self.params["beta"] = jnp.asarray(1.0)
        self.F_pauli = lambda y, s2, q: y * (1.0 + 40.0 / 27.0 * (q - s2))
        self._preset = ("yuk2",)

    def set_yuk3(self, a=4.0):
        self.params["alpha"] = jnp.asarray(1.3629)
        self.params["beta"] = jnp.asarray(1.0)
        self.F_pauli = lambda y, s2, q: y * _T_a(a, 40.0 / 27.0 * (q - s2))
        self._preset = ("yuk3", a)

    def set_yuk4(self, a=3.3):
        self.params["alpha"] = jnp.asarray(1.3629)
        self.params["beta"] = jnp.asarray(1.0)
        self.F_pauli = lambda y, s2, q: (y * _T_a(a, -40.0 / 27.0 * s2)
                                         * _T_a(2.0, 40.0 / 27.0 * q))
        self._preset = ("yuk4", a)

    def _G0_G(self, s2, q):
        alpha, beta = self.params["alpha"], self.params["beta"]
        G0 = alpha**2 * (alpha**2 - 60.0) / (108.0 * beta * (9.0 * beta - 10.0))
        G = (40.0 / 27.0 / beta - 4.0 / alpha**2 * (beta - 1.0) * G0) * (q - beta * s2)
        return G0, G

    def set_yuk2beta(self, alpha, beta):
        self.params["alpha"] = jnp.asarray(float(alpha))
        self.params["beta"] = jnp.asarray(float(beta))

        def func(y, s2, q):
            G0, G = self._G0_G(s2, q)
            return 1.0 - G0 + y * (G0 + G)
        self.F_pauli = func
        self._preset = ("yuk2beta",)

    def set_yuk3beta(self, alpha, beta, a=2.0):
        self.params["alpha"] = jnp.asarray(float(alpha))
        self.params["beta"] = jnp.asarray(float(beta))

        def func(y, s2, q):
            G0, G = self._G0_G(s2, q)
            return _T_a(a, -G0 + y * (G0 + G))
        self.F_pauli = func
        self._preset = ("yuk3beta", a)

    # -- ladder management -----------------------------------------------
    def prepare(self, box_vecs, den):
        """Cache a static xi ladder from a concrete density (for tracing)."""
        k_F = powr(3.0 * np.pi**2 * den, 1.0 / 3.0)
        xis = float(self.params["alpha"]) * k_F
        lo = float(jnp.min(xis)) / self.ladder_margin
        hi = float(jnp.max(xis)) * self.ladder_margin
        self.xi_sparse = xi_ladder(lo, hi, self.kappa, self.mode)
        return self.xi_sparse

    def yukawa_descriptor(self, params, k2, den):
        """Yukawa descriptor y(r) (parity: functionals.py:450-475).

        ``self.spline=False`` selects the exact per-point evaluation
        (reference's naive fallback, functionals.py:465-471) — O(N^2), the
        cross-check oracle for the ladder method; keep it to coarse grids.
        """
        k_F = powr(3.0 * np.pi**2 * den, 1.0 / 3.0)
        xis = params["alpha"] * k_F
        g = powr(den, params["beta"])

        def K_tilde(k2_, xi_sparse):
            return 4.0 * np.pi / (k2_[..., None] + xi_sparse**2)

        if not self.spline:
            u = field_dependent_convolution_naive(k2, K_tilde, g, xis)
        else:
            if isinstance(xis, jax.core.Tracer):
                if self.xi_sparse is None:
                    raise RuntimeError(
                        "YukawaGGA: call prepare(box_vecs, den) with a "
                        "concrete density before tracing (jit/grad) the "
                        "functional.")
                ladder = self.xi_sparse
            else:
                ladder = None
            u = field_dependent_convolution(k2, K_tilde, g, xis,
                                            kappa=self.kappa, mode=self.mode,
                                            xi_sparse=ladder)
        return (3.0 * np.pi * params["alpha"]**2
                / (4.0 * k_F * powr(den, params["beta"] - 1.0)) * u)

    def apply(self, params, box_vecs, den):
        vol = volume(box_vecs)
        kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
        y = self.yukawa_descriptor(params, k2, den)
        s2 = reduced_gradient_squared(kx, ky, kz, den)
        q = reduced_laplacian(k2, den)
        F_pauli = self.F_pauli(y, s2, q)
        TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
        return Weizsaecker(box_vecs, den) + qmean(TF_ked * F_pauli) * vol
