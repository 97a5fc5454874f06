"""Exchange-correlation functionals: LDA (PZ / PW / Chachiyo) and PBE.

TPU-native rebuild of /root/reference/src/professad/functionals.py:1510-1635.
Pure jittable E(box_vecs, den) functions; singular denominators are guarded
with the same epsilons as the reference so that results (and gradients) match
to 1e-10.
"""

import numpy as np
import jax.numpy as jnp

from ..ops.grid import (wavevecs, volume, grad_dot_grad, qmean, powr,
                        log_hp)

__all__ = [
    "lda_exchange", "perdew_zunger_correlation", "perdew_wang_correlation",
    "chachiyo_correlation", "PerdewZunger", "PerdewWang", "Chachiyo",
    "pbe_exchange", "pbe_correlation", "PerdewBurkeErnzerhof",
]


def lda_exchange(box_vecs, den):
    """Dirac LDA exchange (parity: functionals.py:1510-1512)."""
    return (-(3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0)
            * qmean(powr(den, 4.0 / 3.0)) * volume(box_vecs))


def perdew_zunger_correlation(box_vecs, den):
    """PZ81 correlation (parity: functionals.py:1515-1521)."""
    gamma, beta1, beta2 = -0.1423, 1.0529, 0.3334
    A, B, C, D = 0.0311, -0.048, 0.002, -0.0116
    rs = powr(3.0 / (4.0 * np.pi) / den, 1.0 / 3.0)
    log_rs = log_hp(rs)
    eps_hi = A * log_rs + B + C * rs * log_rs + D * rs
    eps_lo = gamma / (1.0 + beta1 * jnp.sqrt(rs) + beta2 * rs)
    eps_c = jnp.where(rs < 1.0, eps_hi, eps_lo)
    return qmean(eps_c * den) * volume(box_vecs)


def _pw92_eps(rs):
    A, alpha = 0.0310907, 0.2137
    b1, b2, b3, b4 = 7.5957, 3.5876, 1.6382, 0.49294
    srs = jnp.sqrt(rs)
    zeta = 2.0 * A * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs * rs)
    return -2.0 * A * (1.0 + alpha * rs) * log_hp(1.0 + 1.0 / zeta)


def perdew_wang_correlation(box_vecs, den):
    """PW92 correlation (parity: functionals.py:1524-1530)."""
    rs = powr(3.0 / (4.0 * np.pi) / den, 1.0 / 3.0)
    return qmean(_pw92_eps(rs) * den) * volume(box_vecs)


def chachiyo_correlation(box_vecs, den):
    """Chachiyo 2016 correlation (parity: functionals.py:1533-1537)."""
    a = float(np.log(2.0) - 1.0) / (2.0 * np.pi**2)  # plain float: keeps f32 weak-typing
    b = 20.4562557
    rs = powr(3.0 / (4.0 * np.pi) / den, 1.0 / 3.0)
    eps_c = a * log_hp(1.0 + b / rs + b / rs**2)
    return qmean(eps_c * den) * volume(box_vecs)


def PerdewZunger(box_vecs, den):
    """LDA XC: Dirac exchange + PZ81 correlation (functionals.py:1540-1554)."""
    return lda_exchange(box_vecs, den) + perdew_zunger_correlation(box_vecs, den)


def PerdewWang(box_vecs, den):
    """LDA XC: Dirac exchange + PW92 correlation (functionals.py:1557-1571)."""
    return lda_exchange(box_vecs, den) + perdew_wang_correlation(box_vecs, den)


def Chachiyo(box_vecs, den):
    """LDA XC: Dirac exchange + Chachiyo correlation (functionals.py:1574-1588)."""
    return lda_exchange(box_vecs, den) + chachiyo_correlation(box_vecs, den)


def _pbe_exchange_density(den, gdg):
    """PBE exchange energy density from den and |grad n|^2 (shared with the
    distributed evaluation path, parallel/pfft.py)."""
    eps_x = -(3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0) * powr(den, 4.0 / 3.0)
    s2 = (0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0)
          * gdg * powr(den, -8.0 / 3.0))
    kappa = 0.804
    mu = 0.066725 * np.pi**2 / 3.0
    Fx = 1.0 + kappa - kappa / (1.0 + mu / kappa * s2)
    return Fx * eps_x


def _pbe_correlation_density(den, gdg):
    """PBE correlation energy density from den and |grad n|^2 (incl. the
    reference's 1e-30 guards; shared with parallel/pfft.py)."""
    rs = powr(3.0 / (4.0 * np.pi) / den, 1.0 / 3.0)
    eps_c = _pw92_eps(rs)
    beta = 0.066725
    gamma = float(1.0 - np.log(2.0)) / np.pi**2  # plain float: keeps f32 weak-typing
    A = beta / gamma / (jnp.exp(-eps_c / gamma) - 1.0 + 1e-30)
    t2 = ((1.0 / 16.0) * (np.pi / 3.0) ** (1.0 / 3.0)
          * gdg / (powr(den, 7.0 / 3.0) + 1e-30))
    At2 = A * t2
    H = gamma * log_hp(1.0 + beta / gamma * t2 * (1.0 + At2)
                       / (1.0 + At2 + At2 * At2))
    return (eps_c + H) * den


def pbe_exchange(box_vecs, den):
    """PBE exchange (parity: functionals.py:1597-1603)."""
    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
    gdg = grad_dot_grad(kx, ky, kz, den)
    return qmean(_pbe_exchange_density(den, gdg)) * volume(box_vecs)


def pbe_correlation(box_vecs, den):
    """PBE correlation (parity: functionals.py:1606-1618, incl. 1e-30 guards)."""
    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
    gdg = grad_dot_grad(kx, ky, kz, den)
    return qmean(_pbe_correlation_density(den, gdg)) * volume(box_vecs)


def PerdewBurkeErnzerhof(box_vecs, den):
    """PBE XC (parity: functionals.py:1621-1635)."""
    return pbe_exchange(box_vecs, den) + pbe_correlation(box_vecs, den)
