"""Fused analytic energy + functional-derivative (potential) evaluation.

Why this exists (round-3 TPU measurement): at 128^3 the steady-state
iteration's `jax.value_and_grad` costs ~5.9 ms, of which only ~2.4 ms is
FFTs — the rest is reverse-mode residual traffic (every intermediate is
written to and re-read from HBM between the forward and backward passes).
The hand-derived functional derivatives (the same pencil-and-paper formulas
the reference uses as its test oracle, reference tests/tools_for_tests.py,
and which tests/tools_for_tests.py transcribes) evaluate E and dE/dn
TOGETHER in a single forward sweep: shared spectra, no residuals, 13
transforms instead of 34 for the WT+PBE set.

This module is the library (production) home of those formulas: each
supported term contributes (E, dE/dn) through a shared ``SpectralCtx`` so
common fields (den_ft, gradient components, Lindhard kernel) are computed
once.  ``value_and_potential(terms, box_vecs, den, v_ext)`` assembles the
total; ``System.optimize_density(..., analytic=True)`` drives the whole-
program optimizer with it (validated against jax.grad at 1e-10 in f64 —
tests/test_potentials.py — exactly the identity tier-1 establishes).

Reference parity: the potential formulas mirror the reference's
tests/tools_for_tests.py:11-207, which are themselves FD/AD-validated
there; energy expressions are identical to models/{interaction,kinetic_*,
xc}.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid import (wavevecs, volume, qmean, wmean, powr, log_hp, safe_sqrt,
                        rfftn, irfftn, imul, spectral_convolution)
from .kinetic_local import TF_COEFF
from .kinetic_nonlocal import G_inv_lind

__all__ = ["value_and_potential", "supported_terms", "SpectralCtx"]


class SpectralCtx:
    """Lazily cached shared fields for one (box_vecs, den) evaluation."""

    def __init__(self, box_vecs, den, v_ext=None, N_elec=None):
        self.box_vecs = box_vecs
        self.den = den
        self.v_ext = v_ext
        self.shape = den.shape
        self.vol = volume(box_vecs)
        if N_elec is None:
            N_elec = jax.lax.stop_gradient(wmean(den)) * self.vol
        self.n0 = N_elec / self.vol  # differentiable through vol
        self._c = {}

    def _get(self, key, fn):
        if key not in self._c:
            self._c[key] = fn()
        return self._c[key]

    @property
    def kvecs(self):
        return self._get("kvecs",
                         lambda: wavevecs(self.box_vecs, self.shape))

    @property
    def den_ft(self):
        return self._get("den_ft", lambda: rfftn(self.den))

    @property
    def grads(self):
        """(dn/dx, dn/dy, dn/dz) from the shared den_ft."""
        def mk():
            kx, ky, kz, _ = self.kvecs
            return tuple(irfftn(imul(k, self.den_ft), self.shape)
                         for k in (kx, ky, kz))
        return self._get("grads", mk)

    @property
    def gdg(self):
        """|grad n|^2 from the shared gradient fields."""
        def mk():
            gx, gy, gz = self.grads
            return gx * gx + gy * gy + gz * gz
        return self._get("gdg", mk)

    @property
    def sqrt_den(self):
        return self._get("sqrt_den", lambda: safe_sqrt(self.den))

    @property
    def lap_sqrt_den(self):
        def mk():
            _, _, _, k2 = self.kvecs
            return spectral_convolution(-k2, self.sqrt_den, self.shape)
        return self._get("lap_sqrt_den", mk)

    def divergence(self, fx, fy, fz):
        """div F as one inverse transform (3 forward + 1 inverse)."""
        kx, ky, kz, _ = self.kvecs
        F = imul(kx, rfftn(fx)) + imul(ky, rfftn(fy)) + imul(kz, rfftn(fz))
        return irfftn(F, self.shape)


# --------------------------- per-term (E, dE/dn) ---------------------------

def _vp_ion_electron(ctx):
    E = qmean(ctx.den * ctx.v_ext) * ctx.vol
    return E, ctx.v_ext


def _vp_hartree(ctx):
    _, _, _, k2 = ctx.kvecs
    nz = k2 != 0
    coul = jnp.where(nz, 4.0 * np.pi / jnp.where(nz, k2, 1.0), 0.0)
    v_h = irfftn(coul * ctx.den_ft, ctx.shape)
    E = 0.5 * qmean(ctx.den * v_h) * ctx.vol
    return E, v_h


def _vp_thomas_fermi(ctx):
    E = TF_COEFF * qmean(powr(ctx.den, 5.0 / 3.0)) * ctx.vol
    pot = (5.0 / 3.0) * TF_COEFF * powr(ctx.den, 2.0 / 3.0)
    return E, pot


def _vp_weizsaecker(ctx):
    """Laplacian form.  The 1/4 lap(n) piece of the energy density
    integrates to exactly zero on the periodic grid (its k=0 component
    vanishes), so E = -1/2 qmean(sqrt(n) lap sqrt(n)) vol shares the ONE
    transform pair with the potential -1/2 lap(sqrt n)/sqrt n."""
    lap_s = ctx.lap_sqrt_den
    E = -0.5 * qmean(ctx.sqrt_den * lap_s) * ctx.vol
    pos = ctx.den > 0
    pot = jnp.where(pos, -0.5 * lap_s / jnp.where(pos, ctx.sqrt_den, 1.0),
                    0.0)
    return E, pot


def _vp_nlkef(ctx, alpha, beta):
    """Wang-Teter-style nonlocal term, fused E + potential
    (formula parity: reference tools_for_tests non_local_KEFD)."""
    _, _, _, k2 = ctx.kvecs
    n0 = ctx.n0
    k_F = (3.0 * np.pi**2 * n0) ** (1.0 / 3.0)
    eta = safe_sqrt(k2) / (2.0 * k_F)
    G_inv = G_inv_lind(eta)
    kern = (5.0 / (9.0 * alpha * beta * n0 ** (alpha + beta - 5.0 / 3.0))
            * (1.0 / G_inv - 3.0 * eta * eta - 1.0))
    d_a = powr(ctx.den, alpha) - n0 ** alpha
    if alpha == beta:
        conv_b = spectral_convolution(kern, d_a, ctx.shape)
        conv_a = conv_b
        d_b = d_a
    else:
        d_b = powr(ctx.den, beta) - n0 ** beta
        d_b_ft = rfftn(d_b)
        conv_b = irfftn(kern * d_b_ft, ctx.shape)
        conv_a = irfftn(kern * rfftn(d_a), ctx.shape)
    E = TF_COEFF * qmean(d_a * conv_b) * ctx.vol
    pot = TF_COEFF * (alpha * powr(ctx.den, alpha - 1.0) * conv_b
                      + beta * powr(ctx.den, beta - 1.0) * conv_a)
    return E, pot


def _pw92_eps_and_deriv(den):
    """PW92 eps_c and d eps_c/dn (reference tools_for_tests:122-134)."""
    A, alpha = 0.0310907, 0.2137
    b1, b2, b3, b4 = 7.5957, 3.5876, 1.6382, 0.49294
    rs = powr(3.0 / (4.0 * np.pi) / den, 1.0 / 3.0)
    srs = jnp.sqrt(rs)
    zeta = 2.0 * A * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs * rs)
    lg = log_hp(1.0 + 1.0 / zeta)
    eps = -2.0 * A * (1.0 + alpha * rs) * lg
    deps_dn = (-rs / 3.0 / den
               * (-2.0 * A * alpha * lg
                  + (2.0 * A * A * (1.0 + alpha * rs)
                     * (b1 / srs + 2.0 * b2 + 3.0 * b3 * srs + 4.0 * b4 * rs)
                     / (zeta * (zeta + 1.0)))))
    return eps, deps_dn


def _vp_pbe(ctx):
    """PBE exchange + correlation fused: shared gradient fields, and the
    two divergence terms combined into ONE divergence evaluation
    (reference tools_for_tests:145-204)."""
    den = ctx.den
    gdg = ctx.gdg

    # exchange
    eps = -(3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0) * powr(den, 1.0 / 3.0)
    deps_dn = -(1.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0) * powr(den, -2.0 / 3.0)
    s2 = 0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0) * gdg * powr(den, -8.0 / 3.0)
    kappa, mu = 0.804, 0.066725 * np.pi**2 / 3.0
    Fx = 1.0 + kappa - kappa / (1.0 + mu / kappa * s2)
    ds2_dgn2 = 0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0) * powr(den, -8.0 / 3.0)
    ds2_dn = -(8.0 / 3.0) * s2 / den
    dFx_ds2 = mu / (1.0 + mu / kappa * s2) ** 2
    E_x = qmean(Fx * eps * den) * ctx.vol
    df_dn_x = Fx * (deps_dn * den + eps) + dFx_ds2 * ds2_dn * eps * den
    df_dgn2_x = dFx_ds2 * ds2_dgn2 * eps * den

    # correlation
    eps_c, deps_dn_c = _pw92_eps_and_deriv(den)
    beta, gamma = 0.066725, float(1.0 - np.log(2.0)) / np.pi**2
    A = beta / gamma / (jnp.exp(-eps_c / gamma) - 1.0 + 1e-30)
    dAdn = 1.0 / beta * A * A * jnp.exp(-eps_c / gamma) * deps_dn_c
    t2 = ((1.0 / 16.0) * (np.pi / 3.0) ** (1.0 / 3.0)
          * gdg / (powr(den, 7.0 / 3.0) + 1e-30))
    dt2dn = -7.0 / 3.0 * t2 / den
    dt2dgn2 = (1.0 / 16.0) * (np.pi / 3.0) ** (1.0 / 3.0) / (
        powr(den, 7.0 / 3.0) + 1e-30)
    At2 = A * t2
    numer = 1.0 + At2
    denom = 1.0 + At2 + At2 * At2
    H = gamma * log_hp(1.0 + beta / gamma * t2 * (numer / denom))
    E_c = qmean((eps_c + H) * den) * ctx.vol
    numer2 = 1.0 + 2.0 * At2
    eH = jnp.exp(-H / gamma)
    dHdn = beta * eH * (
        (dt2dn * numer2 + dAdn * t2 * t2) / denom
        - t2 * numer / denom**2 * (dt2dn * A * numer2 + dAdn * t2 * numer2))
    dH_dgn2 = beta * eH * (
        dt2dgn2 * numer2 / denom
        - At2 * numer / denom**2 * dt2dgn2 * numer2)
    df_dn_c = eps_c + H + den * (deps_dn_c + dHdn)
    df_dgn2_c = den * dH_dgn2

    # one combined divergence for both pieces
    gx, gy, gz = ctx.grads
    w = df_dgn2_x + df_dgn2_c
    aux = -2.0 * ctx.divergence(w * gx, w * gy, w * gz)
    return E_x + E_c, df_dn_x + df_dn_c + aux


def _vp_gga_kinetic(ctx, F_and_dF, clamp_s=None):
    """Shared machinery for GGA Pauli terms: E = vW + qmean(TF_ked F(s)),
    pot = vW' + F TF' + dF/ds (ds/dn TF_ked) - div(...) — one combined
    divergence (reference tools_for_tests _gga_kinetic_kp)."""
    den = ctx.den
    gdg = ctx.gdg
    abs_grad = safe_sqrt(gdg)
    c_s = 0.5 * (3.0 * np.pi**2) ** (-1.0 / 3.0)
    s = c_s * abs_grad * powr(den, -4.0 / 3.0)
    if clamp_s is not None:
        clamped = s >= clamp_s
        s = jnp.minimum(s, clamp_s)
    F, dF = F_and_dF(s)
    if clamp_s is not None:
        dF = jnp.where(clamped, 0.0, dF)  # min() kills the chain beyond
    TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E = E_vw + qmean(TF_ked * F) * ctx.vol

    dsdn = c_s * (-4.0 / 3.0) * abs_grad * powr(den, -7.0 / 3.0)
    dsdgradn = c_s * powr(den, -4.0 / 3.0)
    term1 = pot_vw + F * (5.0 / 3.0) * TF_COEFF * powr(den, 2.0 / 3.0)
    term2 = dF * dsdn * TF_ked
    gx, gy, gz = ctx.grads
    nzg = abs_grad > 0
    w = jnp.where(nzg, dF * dsdgradn * TF_ked
                  / jnp.where(nzg, abs_grad, 1.0), 0.0)
    term3 = -ctx.divergence(w * gx, w * gy, w * gz)
    return E, term1 + term2 + term3


def _vp_lkt(ctx):
    def F_and_dF(s):
        F = 1.0 / jnp.cosh(1.3 * s)
        return F, -1.3 * jnp.tanh(1.3 * s) * F
    return _vp_gga_kinetic(ctx, F_and_dF, clamp_s=100.0)


def _vp_pauli_gaussian(ctx, params):
    """PauliGaussian family incl. the q (reduced-Laplacian) terms
    (reference tools_for_tests PGSL_kp pattern, generalized to the full
    F = e^{-mu s^2} + beta q^2 - lamb q s^2 + sigma s^4)."""
    den = ctx.den
    _, _, _, k2 = ctx.kvecs
    gdg = ctx.gdg
    mu = jnp.abs(params["mu"])
    beta = jnp.abs(params["beta"])
    lamb = jnp.abs(params["lamb"])
    sigma = jnp.abs(params["sigma"])
    c2 = 0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0)
    s2 = c2 * gdg * powr(den, -8.0 / 3.0)
    lap_den = irfftn(-k2 * ctx.den_ft, ctx.shape)
    q = c2 * lap_den * powr(den, -5.0 / 3.0)
    expms2 = jnp.exp(-mu * s2)
    F = expms2 + beta * q * q - lamb * q * s2 + sigma * s2 * s2
    TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E = E_vw + qmean(TF_ked * F) * ctx.vol

    dF_ds2 = -mu * expms2 - lamb * q + 2.0 * sigma * s2
    dF_dq = 2.0 * beta * q - lamb * s2
    ds2_dn = -(8.0 / 3.0) * s2 / den
    ds2_dgn2 = c2 * powr(den, -8.0 / 3.0)
    dq_dn = -(5.0 / 3.0) * q / den
    dq_dlapn = c2 * powr(den, -5.0 / 3.0)

    pot = (pot_vw + F * (5.0 / 3.0) * TF_COEFF * powr(den, 2.0 / 3.0)
           + (dF_ds2 * ds2_dn + dF_dq * dq_dn) * TF_ked)
    gx, gy, gz = ctx.grads
    w = dF_ds2 * ds2_dgn2 * TF_ked
    pot = pot - 2.0 * ctx.divergence(w * gx, w * gy, w * gz)
    # q contributes through the Laplacian: + lap(dF/dq dq/dlap TF_ked)
    pot = pot + irfftn(-k2 * rfftn(dF_dq * dq_dlapn * TF_ked), ctx.shape)
    return E, pot


def _vp_vwgtf(ctx, which):
    """vWGTF1/2: d = n / n0-detached, enhancement G(d) on TF
    (reference tools-style chain; n0 carries zero density-gradient because
    the electron count is rounded+detached)."""
    den = ctx.den
    N_elec = jnp.round(jax.lax.stop_gradient(wmean(den)) * ctx.vol)
    n0 = N_elec / ctx.vol
    d = den / n0
    if which == 1:
        G = 0.9892 * powr(d, -1.2994)
        dG_dd = 0.9892 * (-1.2994) * powr(d, -2.2994)
    else:
        u = 5.7001 * powr(d, 0.2563) - 5.7001
        ELF = 0.5 * (1.0 + jnp.tanh(u))
        G = jnp.sqrt(1.0 / ELF - 1.0)
        sech2 = 1.0 - jnp.tanh(u) ** 2
        dELF_dd = 0.5 * sech2 * 5.7001 * 0.2563 * powr(d, -0.7437)
        pos = G > 0
        dG_dELF = jnp.where(pos, -1.0 / (2.0 * jnp.where(pos, G, 1.0)
                                         * ELF * ELF), 0.0)
        dG_dd = dG_dELF * dELF_dd
    TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E = E_vw + qmean(G * TF_ked) * ctx.vol
    pot = (pot_vw + dG_dd / n0 * TF_ked
           + G * (5.0 / 3.0) * TF_COEFF * powr(den, 2.0 / 3.0))
    return E, pot


def _vp_pz_correlation(ctx):
    den = ctx.den
    gamma, beta1, beta2 = -0.1423, 1.0529, 0.3334
    A, B, C, D = 0.0311, -0.048, 0.002, -0.0116
    rs = powr(3.0 / (4.0 * np.pi) / den, 1.0 / 3.0)
    log_rs = log_hp(rs)
    eps_hi = A * log_rs + B + C * rs * log_rs + D * rs
    srs = jnp.sqrt(rs)
    eps_lo = gamma / (1.0 + beta1 * srs + beta2 * rs)
    E = qmean(jnp.where(rs < 1.0, eps_hi, eps_lo) * den) * ctx.vol
    pot_hi = (log_rs * (A + 2.0 / 3.0 * C * rs) + (B - A / 3.0)
              + rs / 3.0 * (2.0 * D - C))
    pot_lo = (gamma * (1.0 + 7.0 / 6.0 * beta1 * srs + 4.0 / 3.0 * beta2 * rs)
              / (1.0 + beta1 * srs + beta2 * rs) ** 2)
    return E, jnp.where(rs < 1.0, pot_hi, pot_lo)


def _vp_chachiyo_correlation(ctx):
    den = ctx.den
    a = float(np.log(2.0) - 1.0) / (2.0 * np.pi**2)
    b = 20.4562557
    rs = powr(3.0 / (4.0 * np.pi) / den, 1.0 / 3.0)
    inner = 1.0 + b / rs + b / rs**2
    eps = a * log_hp(inner)
    E = qmean(eps * den) * ctx.vol
    deps_drs = a / inner * (-b / rs**2 - 2.0 * b / rs**3)
    drs_dn = (3.0 / (4.0 * np.pi)) ** (1.0 / 3.0) * (-1.0 / 3.0) * powr(
        den, -4.0 / 3.0)
    return E, deps_drs * drs_dn * den + eps


def _vp_lda_exchange(ctx):
    den = ctx.den
    E = (-(3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0)
         * qmean(powr(den, 4.0 / 3.0)) * ctx.vol)
    pot = -(3.0 / np.pi) ** (1.0 / 3.0) * powr(den, 1.0 / 3.0)
    return E, pot


def _vp_pw_correlation(ctx):
    eps, deps_dn = _pw92_eps_and_deriv(ctx.den)
    E = qmean(eps * ctx.den) * ctx.vol
    return E, deps_dn * ctx.den + eps


_WT = 5.0 / 6.0
_WGC_A = float(5.0 + np.sqrt(5.0)) / 6.0
_WGC_B = float(5.0 - np.sqrt(5.0)) / 6.0

_DISPATCH = {
    "IonElectron": _vp_ion_electron,
    "Hartree": _vp_hartree,
    "ThomasFermi": _vp_thomas_fermi,
    "Weizsaecker": _vp_weizsaecker,
    "WangTeter": lambda ctx: _sum_vp(ctx, [
        _vp_weizsaecker, _vp_thomas_fermi,
        lambda c: _vp_nlkef(c, _WT, _WT)]),
    "Perrot": lambda ctx: _sum_vp(ctx, [
        _vp_weizsaecker, _vp_thomas_fermi,
        lambda c: _vp_nlkef(c, 1.0, 1.0)]),
    "SmargiassiMadden": lambda ctx: _sum_vp(ctx, [
        _vp_weizsaecker, _vp_thomas_fermi,
        lambda c: _vp_nlkef(c, 0.5, 0.5)]),
    "WangGovindCarter98": lambda ctx: _sum_vp(ctx, [
        _vp_weizsaecker, _vp_thomas_fermi,
        lambda c: _vp_nlkef(c, _WGC_A, _WGC_B)]),
    "PerdewBurkeErnzerhof": _vp_pbe,
    "lda_exchange": _vp_lda_exchange,
    "perdew_wang_correlation": _vp_pw_correlation,
    "PerdewWang": lambda ctx: _sum_vp(ctx, [_vp_lda_exchange,
                                            _vp_pw_correlation]),
    "LuoKarasievTrickey": _vp_lkt,
    "vWGTF1": lambda ctx: _vp_vwgtf(ctx, 1),
    "vWGTF2": lambda ctx: _vp_vwgtf(ctx, 2),
    "perdew_zunger_correlation": _vp_pz_correlation,
    "chachiyo_correlation": _vp_chachiyo_correlation,
    "PerdewZunger": lambda ctx: _sum_vp(ctx, [_vp_lda_exchange,
                                              _vp_pz_correlation]),
    "Chachiyo": lambda ctx: _sum_vp(ctx, [_vp_lda_exchange,
                                          _vp_chachiyo_correlation]),
}

def _vp_mgp(ctx, owner):
    """MiGenovaPavanello: fixed (density-independent given detached n0)
    k-space kernel, so the nonlocal potential is the symmetric-kernel
    closed form (5/3) n^{-1/6} conv(K, n^{5/6})."""
    den = ctx.den
    _, _, _, k2 = ctx.kvecs
    N_elec = jnp.round(jax.lax.stop_gradient(wmean(den)) * ctx.vol)
    n0 = N_elec / ctx.vol
    k_F = (3.0 * np.pi**2 * n0) ** (1.0 / 3.0)
    if owner.kernel is None:
        raise RuntimeError("MGP: call prepare() before the analytic path.")
    K = owner._kernel_ft(owner.params, ctx.box_vecs, den.dtype, ctx.shape,
                         k2, k_F)
    g = powr(den, 5.0 / 6.0)
    conv = spectral_convolution(K, g, ctx.shape)
    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E_tf, pot_tf = _vp_thomas_fermi(ctx)
    E = E_vw + E_tf + qmean(g * conv) * ctx.vol
    pot = (pot_vw + pot_tf
           + (5.0 / 3.0) * powr(den, -1.0 / 6.0) * conv)
    return E, pot


# ---------------- Huang-Carter family: analytic ladder potential ------------

def _tangent_matrix(lad):
    """Catmull-Rom tangent operator T (m = T f) for the ladder —
    (n_xi, n_xi), mirroring ops.interp._tangents exactly.  Built with
    traced ops so the AUX ladder (a jit argument) can supply the knot
    values — weights must come from the SAME ladder as the kernel slabs,
    or a same-shape jit-cache reuse would silently mix stale knots with
    fresh slabs (the ADVICE round-2 stale-constant hazard)."""
    n = lad.shape[0]
    inv = 1.0 / jnp.diff(lad)
    T = jnp.zeros((n, n), lad.dtype)
    T = T.at[0, 0].set(-inv[0]).at[0, 1].set(inv[0])
    T = T.at[n - 1, n - 2].set(-inv[-1]).at[n - 1, n - 1].set(inv[-1])
    k = jnp.arange(1, n - 1)
    T = T.at[k, k - 1].add(-0.5 * inv[k - 1])
    T = T.at[k, k].add(0.5 * inv[k - 1] - 0.5 * inv[k])
    T = T.at[k, k + 1].add(0.5 * inv[k])
    return T


def _ladder_weights(lad, xis, dtype):
    """Dense per-point ladder weights w and their xi-derivative dw such that
    K(r) = sum_j w_j(r) f_j(r) reproduces ops.interp.interpolate_kernel
    EXACTLY (incl. the Catmull-Rom tangents), and dK/dxi = sum_j dw_j f_j.
    ``lad`` may be traced (the aux ladder).  Shapes: (..., n_xi)."""
    from ..ops.interp import _bracket

    lad = jnp.asarray(lad, dtype)
    T = _tangent_matrix(lad)
    idx = _bracket(lad, xis)
    x0 = lad[idx]
    dx = lad[idx + 1] - x0
    t = (xis - x0) / dx
    t2 = t * t
    t3 = t2 * t
    h00 = 1.0 - 3.0 * t2 + 2.0 * t3
    h10 = t - 2.0 * t2 + t3
    h01 = 3.0 * t2 - 2.0 * t3
    h11 = t3 - t2
    h00_t = -6.0 * t + 6.0 * t2
    h10_t = 1.0 - 4.0 * t + 3.0 * t2
    h01_t = 6.0 * t - 6.0 * t2
    h11_t = 3.0 * t2 - 2.0 * t

    jj = jnp.arange(lad.size)
    e = idx[..., None]
    on0 = (jj == e).astype(dtype)
    on1 = (jj == e + 1).astype(dtype)
    T0 = jnp.take(T, idx, axis=0)       # (..., n_xi) rows T[idx]
    T1 = jnp.take(T, idx + 1, axis=0)
    w = (h00[..., None] * on0 + h01[..., None] * on1
         + dx[..., None] * (h10[..., None] * T0 + h11[..., None] * T1))
    dw = ((h00_t[..., None] * on0 + h01_t[..., None] * on1) / dx[..., None]
          + h10_t[..., None] * T0 + h11_t[..., None] * T1)
    return w, dw


def _vp_hc_family(ctx, owner, aux=None):
    """HuangCarter / RevisedHuangCarter fused analytic potential.

    The functional derivative of T_NL = C int n^{8/3-b} K[n](r) / xi(r)^3
    has three pieces: (a) the direct density factors; (b) the adjoint of
    the field-dependent convolution — ANOTHER ladder of convolutions with
    the Hermite weights on the output side, batched into one 4-D forward
    FFT + one inverse; (c) the xi(r) chain (dK/dxi from the weight
    derivatives + the -3/xi^4 factor), split into its local-density part
    and a divergence term for the |grad n|^2 dependence.  Validated against
    jax.grad at rtol 1e-10 (tests/test_potentials.py).

    Requires ``owner.prepare(box, den)`` with a concrete cell (the aux
    kernel-slab stack), like the jitted optimizer paths.
    """
    if aux is None:
        aux = owner.aux_arrays()
    if aux is None:
        raise RuntimeError(
            "HC analytic path: call prepare(box_vecs, den) with a concrete "
            "cell first (the kernel-slab aux is required).")
    den = ctx.den
    dt = den.dtype
    lad = aux["ladder"].astype(dt)
    W = aux["slabs"].astype(dt)          # (m1, m2, m3, n_xi)
    beta = float(owner.params["beta"])
    C_HC = TF_COEFF * 8.0 * (3.0 * np.pi**2)

    gdg = ctx.gdg
    k_F = powr(3.0 * np.pi**2 * den, 1.0 / 3.0)

    if type(owner).__name__ == "HuangCarter":
        lamb = owner.params["lamb"].astype(dt)
        u = gdg / (powr(den, 8.0 / 3.0) + 1e-30)
        xis = 2.0 * k_F * (1.0 + lamb * u)
        dxi_dn = (xis / (3.0 * den)
                  - 2.0 * k_F * lamb * (8.0 / 3.0) * u / den)
        dxi_dgdg = 2.0 * k_F * lamb / (powr(den, 8.0 / 3.0) + 1e-30)
    else:  # RevisedHuangCarter
        a = owner.params["a"].astype(dt)
        b = owner.params["b"].astype(dt)
        c2 = 0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0)
        s2 = c2 * gdg * powr(den, -8.0 / 3.0)
        F = 1.0 + a * s2 / (1.0 + b * s2)
        Fp = a / (1.0 + b * s2) ** 2
        xis = 2.0 * k_F * F
        dxi_dn = (2.0 / 3.0) * k_F * F / den \
            + 2.0 * k_F * Fp * (-8.0 / 3.0) * s2 / den
        dxi_dgdg = 2.0 * k_F * Fp * c2 * powr(den, -8.0 / 3.0)

    # batched forward convolution: f_j(r) = irfftn(W_j * g^)(r)
    # (pencil-aware + f32 DC-split through the fieldconv helpers)
    from ..ops.fieldconv import ladder_convolution, ladder_adjoint
    g = powr(den, beta)
    conv = ladder_convolution(W, g, ctx.shape)

    w, dw = _ladder_weights(lad, xis, dt)
    K = jnp.sum(w * conv, axis=-1)
    dK_dxi = jnp.sum(dw * conv, axis=-1)

    xi3 = xis * xis * xis
    A = powr(den, 8.0 / 3.0 - beta)
    E_nl = C_HC * qmean(A * K / xi3) * ctx.vol

    # (a) direct density factor
    pot = C_HC * (8.0 / 3.0 - beta) * powr(den, 5.0 / 3.0 - beta) * K / xi3

    # (b) convolution adjoint: J = sum_j conv_j(F_out * w_j), one batched
    # forward + one inverse (kernels are real and |k|-symmetric)
    F_out = A / xi3
    B = (C_HC * F_out)[..., None] * w
    J = ladder_adjoint(W, B, ctx.shape)
    pot = pot + beta * powr(den, beta - 1.0) * J

    # (c) xi chain: G = d/dxi of the integrand
    G = C_HC * A * (dK_dxi / xi3 - 3.0 * K / (xi3 * xis))
    pot = pot + G * dxi_dn
    gx, gy, gz = ctx.grads
    wdiv = G * dxi_dgdg
    pot = pot - 2.0 * ctx.divergence(wdiv * gx, wdiv * gy, wdiv * gz)

    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E_tf, pot_tf = _vp_thomas_fermi(ctx)
    return E_vw + E_tf + E_nl, pot_vw + pot_tf + pot


def _vp_wtsf(ctx, owner):
    """WangTeterStyleFunctional: E = vW + TF f(u), u = T_NL/(f'(0) TF) with
    both energies scalars — the potential follows from the scalar quotient
    rule, with f'(u) evaluated exactly by jax.grad on the scalar stabilizer."""
    alpha = float(owner.params["alpha"])
    beta = float(owner.params["beta"])
    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E_tf, pot_tf = _vp_thomas_fermi(ctx)
    E_nl, pot_nl = _vp_nlkef(ctx, alpha, beta)
    u = (E_nl / owner.fprime0 / E_tf).astype(ctx.den.dtype)
    fu = owner.f(u)
    fpu = jax.grad(lambda x: owner.f(x))(u)
    # d u/dn = (T_NL' TF - T_NL TF')/(f'(0) TF^2), everything per-point
    du = (pot_nl * E_tf - E_nl * pot_tf).astype(ctx.den.dtype) \
        / owner.fprime0 / jnp.asarray(E_tf * E_tf, ctx.den.dtype)
    E = E_vw + E_tf * fu
    pot = pot_vw + pot_tf * fu + jnp.asarray(E_tf, ctx.den.dtype) * fpu * du
    return E, pot


def _vp_wgc99(ctx, owner):
    """WangGovindCarter99: second-order Taylor density-dependent kernel —
    the potential is the product/adjoint expansion of the six convolution
    terms (12 symmetric convolutions total, forward transforms shared)."""
    from .kinetic_nonlocal import _wgc99_kernel

    den = ctx.den
    dt = den.dtype
    _, _, _, k2 = ctx.kvecs
    N_elec = jnp.round(jax.lax.stop_gradient(wmean(den)) * ctx.vol)
    n0 = N_elec / ctx.vol
    params = owner.params
    n_ref = params["kappa"].astype(dt) * n0
    k_F = (3.0 * np.pi**2 * n_ref) ** (1.0 / 3.0)
    eta = safe_sqrt(k2) / (2.0 * k_F)
    # read the CONCRETE parameter values before any staged op touches
    # them: under jit/shard_map tracing, astype() returns a tracer and
    # float() would raise (the analytic path requires concrete params)
    alpha_f = float(params["alpha"])
    beta_f = float(params["beta"])
    gamma_f = float(params["gamma"])
    alpha = jnp.asarray(alpha_f, dt)
    beta = jnp.asarray(beta_f, dt)
    gamma = jnp.asarray(gamma_f, dt)
    w0, w1, w2 = _wgc99_kernel(eta, alpha_f, beta_f, gamma_f,
                               owner.num_terms)
    T = 20.0 * n_ref ** (5.0 / 3.0 - alpha - beta)
    w0 = T * w0
    w1 = T * w1
    w2 = T * w2
    K1 = -eta * w1 / (6.0 * n_ref)
    K2 = (eta * eta * w2 + (7.0 - gamma) * eta * w1) / (36.0 * n_ref**2)
    K3 = (eta * eta * w2 + (1.0 + gamma) * eta * w1) / (36.0 * n_ref**2)

    theta = den - n_ref
    nb = powr(den, beta_f)
    a = powr(den, alpha_f)
    dnb = beta * powr(den, beta_f - 1.0)
    da = alpha * powr(den, alpha_f - 1.0)
    cv = lambda kern, field: spectral_convolution(kern, field, ctx.shape)

    C0 = cv(w0, nb)
    C1 = cv(K1, nb)
    C1p = cv(K1, nb * theta)
    C2 = cv(K2, nb)
    C2p = cv(K2, 0.5 * nb * theta * theta)
    C3p = cv(K3, nb * theta)
    conv = (C0 + theta * C1 + C1p + 0.5 * theta * theta * C2 + C2p
            + theta * C3p)
    E_nl = TF_COEFF * qmean(a * conv) * ctx.vol

    at = a * theta
    pot = (da * conv                       # through a = n^alpha
           + cv(w0, a) * dnb               # term 1 adjoint
           + a * C1                        # term 2, theta factor
           + cv(K1, at) * dnb              # term 2 adjoint
           + cv(K1, a) * (dnb * theta + nb)        # term 3 adjoint
           + at * C2                       # term 4, theta^2 factor
           + cv(K2, 0.5 * at * theta) * dnb        # term 4 adjoint
           + cv(K2, a) * (0.5 * dnb * theta * theta + nb * theta)  # term 5
           + a * C3p                       # term 6, theta factor
           + cv(K3, at) * (dnb * theta + nb))      # term 6 adjoint
    pot = TF_COEFF * pot

    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E_tf, pot_tf = _vp_thomas_fermi(ctx)
    return E_vw + E_tf + E_nl, pot_vw + pot_tf + pot


def _vp_kgap(ctx, E_gap, f):
    """KGAP fused analytic potential: the WTSF-style scalar-quotient chain
    over the gapped-jellium response kernel (reference
    functionals.py:1131-1171).  ``E_gap`` and ``f`` come from a
    ``functools.partial`` binding (see ``_partial_vp``); f'(u) is exact
    ``jax.grad`` on the scalar stabilizer, so ANY f with f(0) = 1 is
    supported, not just the default 1 + x."""
    from .kinetic_nonlocal import G_inv_gap

    den = ctx.den
    dt = den.dtype
    with jax.ensure_compile_time_eval():
        zero = jnp.zeros(())
        assert float(f(zero)) == 1.0, "Requires f(0) = 1"
        fprime0 = float(jax.grad(lambda x: f(x))(zero))

    # gap-interpolated exponents (KGAP body, kinetic_nonlocal.py)
    b = 5.0
    fraction = E_gap * E_gap / (b + E_gap * E_gap)
    alpha = 0.5 + (float(5.0 + np.sqrt(5.0)) / 6.0 - 0.5) * fraction
    beta = 0.5 + (float(5.0 - np.sqrt(5.0)) / 6.0 - 0.5) * fraction

    # KGAP's n0 is the ROUNDED detached mean density (unlike WT's)
    N_elec = jnp.round(jax.lax.stop_gradient(wmean(den)) * ctx.vol)
    n0 = N_elec / ctx.vol

    eta, G_inv = G_inv_gap(ctx.box_vecs, den, E_gap)
    nz = eta != 0.0
    G_safe = jnp.where(nz, G_inv, 1.0)
    kern = jnp.where(nz, 1.0 / G_safe - 3.0 * eta * eta - 1.0, 0.0)
    kern = (5.0 / (9.0 * alpha * beta * n0 ** (alpha + beta - 5.0 / 3.0))
            * kern)

    g_b = powr(den, beta)
    g_a = powr(den, alpha)
    conv_b = spectral_convolution(kern, g_b, ctx.shape)
    conv_a = spectral_convolution(kern, g_a, ctx.shape)
    T_NL = TF_COEFF * qmean(g_a * conv_b) * ctx.vol
    dT_NL = TF_COEFF * (alpha * powr(den, alpha - 1.0) * conv_b
                        + beta * powr(den, beta - 1.0) * conv_a)

    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E_tf, pot_tf = _vp_thomas_fermi(ctx)
    u = (T_NL / fprime0 / E_tf).astype(dt)
    fu = f(u)
    fpu = jax.grad(lambda x: f(x))(u)
    du = (dT_NL * E_tf - T_NL * pot_tf).astype(dt) / fprime0 \
        / jnp.asarray(E_tf * E_tf, dt)
    E = E_vw + E_tf * fu
    pot = pot_vw + pot_tf * fu + jnp.asarray(E_tf, dt) * fpu * du
    return E, pot


def _vp_yukawa(ctx, owner):
    """YukawaGGA preset fused analytic potential.

    E = vW + int TF_ked F(y, s^2, q) with the Yukawa descriptor
    y = c(n) u, u the spline field-dependent convolution of n^beta with
    the ladder of Yukawa kernels 4 pi/(k^2 + xi_j^2), xi = alpha k_F(r)
    (reference functionals.py:406-607).  The potential has five chains:

      (1) the direct TF_ked factor;
      (2) the prefactor c(n) ~ n^{2/3 - beta}:    (2/3 - beta) y / n;
      (3) u's xi dependence: the Hermite-weight derivative contraction
          (``_ladder_weights``), with d xi/dn = xi / (3 n);
      (4) u's convolution adjoint over g = n^beta — the same batched
          one-forward-one-inverse ladder adjoint as the HC family;
      (5) the s^2 (divergence) and q (Laplacian) chains of the preset's
          closed-form F partials.

    Supported for the fixed preset F_pauli forms (yuk1-4, yuk2beta,
    yuk3beta — tagged by the setters); arbitrary user callables stay
    autodiff-only (``supported_terms`` gates).  Requires
    ``owner.prepare()`` (static ladder).  These analytic forms exist
    NOWHERE in the reference (its tests cover GGA terms only).
    """
    from ..ops.fieldconv import ladder_convolution, ladder_adjoint

    preset = getattr(owner, "_preset", None)
    if preset is None or not owner.spline:
        raise KeyError(
            "YukawaGGA analytic potential: only the tagged presets with "
            "spline=True are supported — gate with supported_terms().")
    if owner.xi_sparse is None:
        raise RuntimeError(
            "YukawaGGA analytic path: call prepare(box_vecs, den) with a "
            "concrete density first (the static xi ladder is required).")

    den = ctx.den
    dt = den.dtype
    _, _, _, k2 = ctx.kvecs
    alpha = float(owner.params["alpha"])
    beta = float(owner.params["beta"])
    lad = jnp.asarray(owner.xi_sparse, dt)

    k_F = powr(3.0 * np.pi**2 * den, 1.0 / 3.0)
    xis = alpha * k_F
    g = powr(den, beta)

    # ladder of constant-xi Yukawa kernels; one batched inverse transform
    W = 4.0 * np.pi / (k2[..., None] + lad * lad)
    conv = ladder_convolution(W, g, ctx.shape)
    w, dw = _ladder_weights(lad, xis, dt)
    u = jnp.sum(w * conv, axis=-1)
    du_dxi = jnp.sum(dw * conv, axis=-1)

    # y = c(n) u, c = 3 pi alpha^2 / (4 k_F n^{beta-1}) ~ n^{2/3 - beta}
    c = 3.0 * np.pi * alpha**2 / (4.0 * k_F * powr(den, beta - 1.0))
    y = c * u

    # density descriptors (shared spectra with the rest of the sweep)
    c2 = 0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0)
    s2 = c2 * ctx.gdg * powr(den, -8.0 / 3.0)
    lap_den = irfftn(-k2 * ctx.den_ft, ctx.shape)
    q = c2 * lap_den * powr(den, -5.0 / 3.0)

    # preset F and closed-form partials
    x0 = 40.0 / 27.0
    tag = preset[0]
    if tag == "yuk1":
        F = y
        F_y = jnp.ones_like(y)
        F_s2 = jnp.zeros_like(y)
        F_q = jnp.zeros_like(y)
    elif tag == "yuk2":
        lin = 1.0 + x0 * (q - s2)
        F = y * lin
        F_y = lin
        F_q = y * x0
        F_s2 = -y * x0
    elif tag == "yuk3":
        a = float(preset[1])
        x = x0 * (q - s2)
        th = jnp.tanh((a / 2.0) * x)
        T = 1.0 + (2.0 / a) * th
        Tp = 1.0 - th * th
        F = y * T
        F_y = T
        F_q = y * Tp * x0
        F_s2 = -y * Tp * x0
    elif tag == "yuk4":
        a = float(preset[1])
        th1 = jnp.tanh((a / 2.0) * (-x0 * s2))
        T1 = 1.0 + (2.0 / a) * th1
        T1p = 1.0 - th1 * th1
        th2 = jnp.tanh(x0 * q)         # T_2(2, x): (2/2) tanh(2x/2)
        T2 = 1.0 + th2
        T2p = 1.0 - th2 * th2
        F = y * T1 * T2
        F_y = T1 * T2
        F_s2 = y * T1p * (-x0) * T2
        F_q = y * T1 * T2p * x0
    elif tag in ("yuk2beta", "yuk3beta"):
        ap = jnp.asarray(owner.params["alpha"], dt)
        bp = jnp.asarray(owner.params["beta"], dt)
        G0 = (ap**2 * (ap**2 - 60.0)
              / (108.0 * bp * (9.0 * bp - 10.0)))
        g_c = x0 / bp - 4.0 / ap**2 * (bp - 1.0) * G0
        G = g_c * (q - bp * s2)
        if tag == "yuk2beta":
            F = 1.0 - G0 + y * (G0 + G)
            F_y = G0 + G
            F_q = y * g_c
            F_s2 = -y * g_c * bp
        else:
            a = float(preset[1])
            x = -G0 + y * (G0 + G)
            th = jnp.tanh((a / 2.0) * x)
            F = 1.0 + (2.0 / a) * th
            Tp = 1.0 - th * th
            F_y = Tp * (G0 + G)
            F_q = Tp * y * g_c
            F_s2 = -Tp * y * g_c * bp
    else:  # pragma: no cover - setters only produce the tags above
        raise KeyError(f"unknown YukawaGGA preset tag {tag!r}")

    TF_ked = TF_COEFF * powr(den, 5.0 / 3.0)
    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E = E_vw + qmean(TF_ked * F) * ctx.vol

    # (1) direct TF_ked factor
    pot = pot_vw + (5.0 / 3.0) * TF_COEFF * powr(den, 2.0 / 3.0) * F

    # (2) + (3): y's local chains (prefactor + xi), d xi/dn = xi/(3n)
    Ay = TF_ked * F_y
    pot = pot + Ay * ((2.0 / 3.0 - beta) * y / den
                      + c * du_dxi * xis / (3.0 * den))

    # (4) convolution adjoint over g = n^beta (batched, kernels symmetric)
    B = (Ay * c)[..., None] * w
    adj = ladder_adjoint(W, B, ctx.shape)
    pot = pot + beta * powr(den, beta - 1.0) * adj

    # (5a) s^2 chain: local + divergence
    As2 = TF_ked * F_s2
    pot = pot + As2 * (-8.0 / 3.0) * s2 / den
    gx, gy, gz = ctx.grads
    wdiv = As2 * c2 * powr(den, -8.0 / 3.0)
    pot = pot - 2.0 * ctx.divergence(wdiv * gx, wdiv * gy, wdiv * gz)

    # (5b) q chain: local + Laplacian adjoint
    Aq = TF_ked * F_q
    pot = pot + Aq * (-5.0 / 3.0) * q / den
    pot = pot + irfftn(-k2 * rfftn(Aq * c2 * powr(den, -5.0 / 3.0)),
                       ctx.shape)
    return E, pot


def _vp_xwm(ctx, kappa=0.0):
    """XuWangMa (any concrete kappa: the bare function is kappa = 0;
    ``functools.partial(XuWangMa, kappa=...)`` bindings are read by
    ``_partial_vp``; opaque lambdas stay rejected by ``supported_terms`` —
    a closure value cannot be extracted safely)."""
    from .kinetic_nonlocal import _xwm_kernels

    den = ctx.den
    _, _, _, k2 = ctx.kvecs
    N_elec = jnp.round(jax.lax.stop_gradient(wmean(den)) * ctx.vol)
    n0 = N_elec / ctx.vol
    # G_inv_lindhard's own (unrounded) detached mean density, exactly as
    # the energy path computes it
    N_lind = jax.lax.stop_gradient(wmean(den)) * ctx.vol
    k_F = (3.0 * np.pi**2 * (N_lind / ctx.vol)) ** (1.0 / 3.0)
    eta = safe_sqrt(k2) / (2.0 * k_F)
    G_inv = G_inv_lind(eta)
    K0, K1a, K1b = _xwm_kernels(eta, G_inv, n0, kappa)

    pa = kappa + 5.0 / 6.0
    pb = kappa + 11.0 / 6.0
    g0 = powr(den, pa)
    g1 = powr(den, pb)
    dg0 = pa * powr(den, pa - 1.0)
    dg1 = pb * powr(den, pb - 1.0)
    cv = lambda kern, field: spectral_convolution(kern, field, ctx.shape)

    c00 = cv(K0, g0)
    c1a1 = cv(K1a, g1)
    c1b0 = cv(K1b, g0)
    E_nl = (qmean(g0 * c00) + qmean(g0 * c1a1) - qmean(g0 * c1b0)) * ctx.vol

    pot = (2.0 * dg0 * c00
           + dg0 * c1a1 + dg1 * cv(K1a, g0)
           - 2.0 * dg0 * c1b0)

    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E_tf, pot_tf = _vp_thomas_fermi(ctx)
    return E_vw + E_tf + E_nl, pot_vw + pot_tf + pot


def _vp_fm(ctx, owner):
    """FoleyMadden: quadratic-response cubic term — the potential expands
    the cubic polynomial in the 11 convolution fields F_i, with ALL the
    adjoint convolutions combined in k-space (11 forward transforms + ONE
    inverse), plus the WT-style linear term and the stabilizer chain."""
    den = ctx.den
    dt = den.dtype
    _, _, _, k2 = ctx.kvecs
    # concrete parameter reads before any staged op (see _vp_wgc99 note)
    alpha_f = float(owner.params["alpha"])
    beta_f = float(owner.params["beta"])
    alpha = jnp.asarray(alpha_f, dt)
    beta = jnp.asarray(beta_f, dt)

    N_elec = jnp.round(jax.lax.stop_gradient(wmean(den)) * ctx.vol)
    n0 = N_elec / ctx.vol
    k_F = (3.0 * np.pi**2 * n0) ** (1.0 / 3.0)
    # G_inv_lindhard's own (unrounded) detached n0, as the energy path does
    n0_lind = jax.lax.stop_gradient(wmean(den))
    k_F_lind = (3.0 * np.pi**2 * n0_lind) ** (1.0 / 3.0)
    eta = safe_sqrt(k2) / (2.0 * k_F_lind)
    G_inv = G_inv_lind(eta)
    q = 2.0 * eta

    kernel = (TF_COEFF * 5.0 / (9.0 * alpha**2 * n0 ** (2.0 * alpha - 5.0 / 3.0))
              * (1.0 / G_inv - 3.0 * eta * eta - 1.0))
    d_a = powr(den, alpha_f) - n0 ** alpha
    conv = spectral_convolution(kernel, d_a, ctx.shape)
    NL1 = qmean(d_a * conv) * ctx.vol
    dNL1 = 2.0 * alpha * powr(den, alpha_f - 1.0) * conv

    K_delta = (alpha**2 * n0 ** (2.0 * alpha - 1.0) / 18.0 * k_F**2
               * (6.0 * alpha - 5.0) * kernel)
    f1, f2, f3, f4, f5, f6, f7 = owner._piecewise_fits(q)
    nz = q != 0.0
    f1_over_q2 = jnp.where(nz, f1 / jnp.where(nz, q, 1.0) ** 2, 0.4)
    kerns = [f1, f1 * q**4, f1_over_q2, f1 * q**2, f2 * f3, f2, f5, f4,
             f6, f7, K_delta]

    delta_nb = powr(den, beta_f) - n0 ** beta
    dnb_ft = rfftn(delta_nb)
    F = [irfftn(kern * dnb_ft, ctx.shape) for kern in kerns]
    F1, F2, F3, F4, F5, F6, F7_, F8, F9, F10, F11 = F
    aux = (-13.0 / 540.0 * F1**3 - F2 * F3**2 / 40.0 + F4 * F3 * F1 / 20.0
           + 3.0 * F5 * F6**2 + 3.0 * F7_ * F8**2 + 3.0 * F9 * F10**2
           + 3.0 * F11 * delta_nb**2)
    c2 = -k_F**2 / beta**3 / n0 ** (3.0 * beta - 1.0)
    NL2 = c2 * qmean(aux) * ctx.vol

    # d aux / d F_i, then one combined k-space adjoint
    dF = [-13.0 / 180.0 * F1**2 + F4 * F3 / 20.0,       # F1
          -F3**2 / 40.0,                                 # F2
          -F2 * F3 / 20.0 + F4 * F1 / 20.0,              # F3
          F3 * F1 / 20.0,                                # F4
          3.0 * F6**2,                                   # F5
          6.0 * F5 * F6,                                 # F6
          3.0 * F8**2,                                   # F7
          6.0 * F7_ * F8,                                # F8
          3.0 * F10**2,                                  # F9
          6.0 * F9 * F10,                                # F10
          3.0 * delta_nb**2]                             # F11
    acc = kerns[0] * rfftn(dF[0])
    for kern, g in zip(kerns[1:], dF[1:]):
        acc = acc + kern * rfftn(g)
    adj = irfftn(acc, ctx.shape) + 6.0 * F11 * delta_nb
    dNL2 = c2 * adj * beta * powr(den, beta_f - 1.0)

    E_vw, pot_vw = _vp_weizsaecker(ctx)
    E_tf, pot_tf = _vp_thomas_fermi(ctx)
    NL = NL1 + NL2
    u = (NL / E_tf).astype(dt)
    fu = owner.f(u)
    fpu = jax.grad(lambda x: owner.f(x))(u)
    du = ((dNL1 + dNL2) * E_tf - NL * pot_tf).astype(dt) \
        / jnp.asarray(E_tf * E_tf, dt)
    E = E_vw + E_tf * fu
    pot = pot_vw + pot_tf * fu + jnp.asarray(E_tf, dt) * fpu * du
    return E, pot


# trainable classes dispatched by instance: params/kernels read from the
# bound term
_INSTANCE_DISPATCH = {
    "PauliGaussian":
        lambda ctx, owner, aux=None: _vp_pauli_gaussian(ctx, owner.params),
    "MiGenovaPavanello": lambda ctx, owner, aux=None: _vp_mgp(ctx, owner),
    "HuangCarter": _vp_hc_family,
    "RevisedHuangCarter": _vp_hc_family,
    "WangTeterStyleFunctional":
        lambda ctx, owner, aux=None: _vp_wtsf(ctx, owner),
    "WangGovindCarter99":
        lambda ctx, owner, aux=None: _vp_wgc99(ctx, owner),
    "FoleyMadden": lambda ctx, owner, aux=None: _vp_fm(ctx, owner),
    "YukawaGGA": lambda ctx, owner, aux=None: _vp_yukawa(ctx, owner),
}


def _partial_vp(t):
    """(ctx -> (E, pot)) for a ``functools.partial``-wrapped supported
    bare function, or None.  Unlike opaque lambdas, a keyword partial
    exposes its bound arguments, so KGAP's E_gap/f and XWM's kappa are
    readable — positional bindings are rejected (they would shift
    box_vecs/den)."""
    import functools
    from .kinetic_nonlocal import KGAP, XuWangMa

    if not isinstance(t, functools.partial) or t.args:
        return None
    kw = dict(t.keywords or {})
    if t.func is KGAP and "E_gap" in kw and set(kw) <= {"E_gap", "f"}:
        E_gap = float(kw["E_gap"])
        f = kw.get("f", lambda x: 1.0 + x)
        return lambda ctx: _vp_kgap(ctx, E_gap, f)
    if t.func is XuWangMa and set(kw) <= {"kappa"}:
        kappa = float(kw.get("kappa", 0.0))
        return lambda ctx: _vp_xwm(ctx, kappa)
    return None


def _sum_vp(ctx, fns):
    E = jnp.zeros((), dtype=jnp.result_type(ctx.den.dtype, jnp.float64))
    pot = jnp.zeros(ctx.shape, dtype=ctx.den.dtype)
    for f in fns:
        e, p = f(ctx)
        E = E + e
        pot = pot + p
    return E, pot


def supported_terms(terms):
    """True iff every density-dependent term has a fused analytic form.

    Notes: ``XuWangMa`` is supported as the bare function (kappa = 0) or a
    keyword ``functools.partial`` (any kappa); ``KGAP`` as a keyword
    partial binding E_gap (any f with f(0) = 1); ``YukawaGGA`` instances
    for the tagged presets (yuk1-4, yuk2beta, yuk3beta) with spline=True.
    Opaque closures (lambdas) stay autodiff-only — their bound values
    cannot be read.
    """
    from ..system import _term_name
    from .kinetic_nonlocal import XuWangMa
    for t in terms:
        nm = _term_name(t)
        if nm == "IonIon":
            continue
        if t is XuWangMa:
            continue
        if _partial_vp(t) is not None:
            continue
        owner = getattr(t, "__self__", t)
        cls = type(owner).__name__
        if cls == "YukawaGGA":
            if getattr(owner, "_preset", None) is not None and owner.spline:
                continue
            return False
        if cls in _INSTANCE_DISPATCH:
            continue
        if nm not in _DISPATCH:
            return False
    return True


def value_and_potential(terms, box_vecs, den, v_ext, N_elec=None, aux=None):
    """Total (E, dE/dn) over the term list in ONE fused forward sweep.

    dE/dn is the per-point functional derivative in atomic units (NOT
    scaled by the quadrature weight).  Raises KeyError for unsupported
    terms — gate with :func:`supported_terms`.  ``aux``: optional per-term
    list (System._collect_term_aux) threading kernel-slab hoists through
    jit as arguments instead of trace-time constants.
    """
    from ..system import _term_name
    ctx = SpectralCtx(box_vecs, den, v_ext, N_elec=N_elec)
    E = jnp.zeros((), dtype=jnp.result_type(den.dtype, jnp.float64))
    pot = jnp.zeros(ctx.shape, dtype=den.dtype)
    from .kinetic_nonlocal import XuWangMa
    for i, t in enumerate(terms):
        nm = _term_name(t)
        if nm == "IonIon":
            continue
        if t is XuWangMa:
            e, p = _vp_xwm(ctx)
            E = E + e
            pot = pot + p
            continue
        pfn = _partial_vp(t)
        if pfn is not None:
            e, p = pfn(ctx)
            E = E + e
            pot = pot + p
            continue
        owner = getattr(t, "__self__", t)
        cls = type(owner).__name__
        if cls in _INSTANCE_DISPATCH:
            e, p = _INSTANCE_DISPATCH[cls](
                ctx, owner, aux=None if aux is None else aux[i])
        else:
            e, p = _DISPATCH[nm](ctx)
        E = E + e
        pot = pot + p
    return E, pot
