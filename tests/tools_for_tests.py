"""Hand-derived analytic functional derivatives and stresses used as the
test oracle for autodiff (tier-1 of the reference test strategy,
/root/reference/tests/tools_for_tests.py).  These are independent analytic
formulas — they validate that jax.grad agrees with pencil-and-paper
functional derivatives to 1e-10."""

import numpy as np
import jax.numpy as jnp

from professad_tpu.ops.grid import (wavevecs, volume, grad_i, grad_dot_grad,
                                    laplacian, reduced_gradient,
                                    reduced_laplacian)
from professad_tpu.models.kinetic_nonlocal import G_inv_lindhard, non_local_KEF
from professad_tpu.models.interaction import Hartree, hartree_potential
from professad_tpu.models.kinetic_local import ThomasFermi
from professad_tpu.models.xc import (lda_exchange, perdew_zunger_correlation,
                                     perdew_wang_correlation,
                                     chachiyo_correlation)


# -------  analytic functional derivatives  -------

def TF_kp(box_vecs, den):
    return 0.5 * (3 * np.pi**2) ** (2 / 3) * den ** (2 / 3)


def vW_kp(box_vecs, den):
    _, _, _, k2 = wavevecs(box_vecs, den.shape)
    sqrt_den = jnp.sqrt(den)
    return -0.5 * laplacian(k2, sqrt_den) / sqrt_den


def TF_ked(den):
    return 0.3 * (3 * np.pi**2) ** (2 / 3) * den ** (5 / 3)


def non_local_KEFD(box_vecs, den, alpha=5 / 6, beta=5 / 6):
    import jax
    vol = volume(box_vecs)
    N_elec = jax.lax.stop_gradient(jnp.mean(den) * vol)  # traceable .item()
    n0 = N_elec / vol
    eta, G_inv = G_inv_lindhard(box_vecs, den)
    kernel = (5 / (9 * alpha * beta * n0 ** (alpha + beta - 5 / 3))
              * (1 / G_inv - 3 * eta * eta - 1))
    conv_a = jnp.fft.irfftn(kernel * jnp.fft.rfftn(den ** alpha), den.shape)
    conv_b = jnp.fft.irfftn(kernel * jnp.fft.rfftn(den ** beta), den.shape)
    LR_kp = 0.3 * (3 * np.pi**2) ** (2 / 3) * (alpha * den ** (alpha - 1) * conv_b
                                               + beta * den ** (beta - 1) * conv_a)
    return TF_kp(box_vecs, den) + vW_kp(box_vecs, den) + LR_kp


def _gga_kinetic_kp(box_vecs, den, F_and_dF):
    """Shared machinery for GGA Pauli potentials given F(s) and dF/ds."""
    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
    s = reduced_gradient(kx, ky, kz, den)
    abs_grad_n = jnp.sqrt(grad_dot_grad(kx, ky, kz, den))
    dsdn = 0.5 * (3 * np.pi**2) ** (-1 / 3) * (-4 / 3) * abs_grad_n * den ** (-7 / 3)
    dsdgradn = 0.5 * (3 * np.pi**2) ** (-1 / 3) * den ** (-4 / 3)
    dndx, dndy, dndz = grad_i(kx, den), grad_i(ky, den), grad_i(kz, den)

    F_theta, dFds = F_and_dF(s)

    term1 = vW_kp(box_vecs, den) + F_theta * TF_kp(box_vecs, den)
    term2 = dFds * dsdn * TF_ked(den)
    aux_x = dFds * dsdgradn * TF_ked(den) * dndx / abs_grad_n
    aux_y = dFds * dsdgradn * TF_ked(den) * dndy / abs_grad_n
    aux_z = dFds * dsdgradn * TF_ked(den) * dndz / abs_grad_n
    term3 = -grad_i(kx, aux_x) - grad_i(ky, aux_y) - grad_i(kz, aux_z)
    return term1 + term2 + term3


def LKT_kp(box_vecs, den):
    def F_and_dF(s):
        F = 1 / jnp.cosh(1.3 * s)
        dF = -1.3 * jnp.tanh(1.3 * s) / jnp.cosh(1.3 * s)
        return F, dF
    return _gga_kinetic_kp(box_vecs, den, F_and_dF)


def PG1_kp(box_vecs, den):
    def F_and_dF(s):
        F = jnp.exp(-s * s)
        return F, -2 * s * F
    return _gga_kinetic_kp(box_vecs, den, F_and_dF)


def PGSL_kp(box_vecs, den):
    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
    s = reduced_gradient(kx, ky, kz, den)
    q = reduced_laplacian(k2, den)

    def F_and_dF(s_):
        F = jnp.exp(-40 / 27 * s_ * s_) + 0.25 * q * q
        dF = -2 * 40 / 27 * s_ * jnp.exp(-40 / 27 * s_ * s_)
        return F, dF

    term_s = _gga_kinetic_kp(box_vecs, den, F_and_dF)
    dqdn = (0.25 * (3 * np.pi**2) ** (-2 / 3) * laplacian(k2, den)
            * (-5 / 3) * den ** (-8 / 3))
    dqdlapn = 0.25 * (3 * np.pi**2) ** (-2 / 3) * den ** (-5 / 3)
    dFdq = 0.5 * q
    term4 = dFdq * dqdn * TF_ked(den)
    term5 = laplacian(k2, dFdq * dqdlapn * TF_ked(den))
    return term_s + term4 + term5


def lda_exchange_potential(box_vecs, den):
    return -(3 / 4) * (3 / np.pi) ** (1 / 3) * (4 / 3) * den ** (1 / 3)


def perdew_zunger_correlation_potential(box_vecs, den):
    gamma, beta1, beta2 = -0.1423, 1.0529, 0.3334
    A, B, C, D = 0.0311, -0.048, 0.002, -0.0116
    rs = (3 / 4 / np.pi / den) ** (1 / 3)
    return jnp.where(
        rs < 1,
        jnp.log(rs) * (A + 2 / 3 * C * rs) + (B - A / 3) + rs / 3 * (2 * D - C),
        gamma * (1 + 7 / 6 * beta1 * jnp.sqrt(rs) + 4 / 3 * beta2 * rs)
        / (1 + beta1 * jnp.sqrt(rs) + beta2 * rs) ** 2)


def perdew_wang_correlation_potential(box_vecs, den):
    A, alpha = 0.0310907, 0.2137
    b1, b2, b3, b4 = 7.5957, 3.5876, 1.6382, 0.49294
    rs = (3 / 4 / np.pi / den) ** (1 / 3)
    zeta = 2 * A * (b1 * rs**0.5 + b2 * rs + b3 * rs**1.5 + b4 * rs**2)
    eps = -2 * A * (1 + alpha * rs) * jnp.log(1 + 1 / zeta)
    deps_dn = (-rs / 3 / den
               * (-2 * A * alpha * jnp.log(1 + 1 / zeta)
                  + (2 * A * A * (1 + alpha * rs)
                     * (b1 * rs**-0.5 + 2 * b2 + 3 * b3 * rs**0.5 + 4 * b4 * rs)
                     / (zeta * (zeta + 1)))))
    return deps_dn * den + eps


def chachiyo_correlation_potential(box_vecs, den):
    a, b = (np.log(2) - 1) / 2 / np.pi**2, 20.4562557
    rs = (3 / 4 / np.pi / den) ** (1 / 3)
    eps = a * jnp.log(1 + b / rs + b / rs**2)
    deps_drs = a / (1 + b / rs + b / rs**2) * (-b / rs**2 - 2 * b / rs**3)
    drs_dn = (3 / 4 / np.pi) ** (1 / 3) * (-1 / 3) * den ** (-4 / 3)
    return deps_drs * drs_dn * den + eps


def pbe_exchange_potential(box_vecs, den):
    eps = -(3 / 4) * (3 / np.pi) ** (1 / 3) * den ** (1 / 3)
    deps_dn = -(1 / 4) * (3 / np.pi) ** (1 / 3) * den ** (-2 / 3)

    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
    s2 = reduced_gradient(kx, ky, kz, den) ** 2
    kappa, mu = 0.804, 0.066725 * np.pi**2 / 3
    Fx = 1 + kappa - kappa / (1 + mu / kappa * s2)
    ds2_dgn2 = 0.25 * (3 * np.pi**2) ** (-2 / 3) * den ** (-8 / 3)
    ds2_dn = -(8 / 3) * s2 / den
    dFx_ds2 = mu / (1 + mu / kappa * s2) ** 2

    df_dn = Fx * (deps_dn * den + eps) + dFx_ds2 * ds2_dn * eps * den
    df_dgn2 = dFx_ds2 * ds2_dgn2 * eps * den
    dndx, dndy, dndz = grad_i(kx, den), grad_i(ky, den), grad_i(kz, den)
    aux = -2 * (grad_i(kx, df_dgn2 * dndx) + grad_i(ky, df_dgn2 * dndy)
                + grad_i(kz, df_dgn2 * dndz))
    return df_dn + aux


def pbe_correlation_potential(box_vecs, den):
    A1, alpha = 0.0310907, 0.2137
    b1, b2, b3, b4 = 7.5957, 3.5876, 1.6382, 0.49294
    rs = (3 / 4 / np.pi / den) ** (1 / 3)
    zeta = 2 * A1 * (b1 * rs**0.5 + b2 * rs + b3 * rs**1.5 + b4 * rs**2)
    eps_c = -2 * A1 * (1 + alpha * rs) * jnp.log(1 + 1 / zeta)
    deps_dn = (-rs / 3 / den
               * (-2 * A1 * alpha * jnp.log(1 + 1 / zeta)
                  + (2 * A1 * A1 * (1 + alpha * rs)
                     * (b1 * rs**-0.5 + 2 * b2 + 3 * b3 * rs**0.5 + 4 * b4 * rs)
                     / (zeta * (zeta + 1)))))

    beta, gamma = 0.066725, (1 - np.log(2)) / np.pi**2
    A = beta / gamma / (jnp.exp(-eps_c / gamma) - 1)
    dAdn = 1 / beta * A**2 * jnp.exp(-eps_c / gamma) * deps_dn

    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
    t2 = (1 / 16) * (np.pi / 3) ** (1 / 3) * grad_dot_grad(kx, ky, kz, den) * den ** (-7 / 3)
    dt2dn = -7 / 3 * t2 / den
    dt2dgn2 = (1 / 16) * (np.pi / 3) ** (1 / 3) * den ** (-7 / 3)

    At2 = A * t2
    numer = 1 + At2
    denom = 1 + At2 + At2**2
    H = gamma * jnp.log(1 + beta / gamma * t2 * (numer / denom))

    numer2 = 1 + 2 * At2
    dHdn = beta * jnp.exp(-H / gamma) * (
        (dt2dn * numer2 + dAdn * t2**2) / denom
        - t2 * numer / denom**2 * (dt2dn * A * numer2 + dAdn * t2 * numer2))
    dH_dgn2 = beta * jnp.exp(-H / gamma) * (
        dt2dgn2 * numer2 / denom - At2 * numer / denom**2 * dt2dgn2 * numer2)
    df_dn = eps_c + H + den * (deps_dn + dHdn)
    df_dgn2 = den * dH_dgn2
    dndx, dndy, dndz = grad_i(kx, den), grad_i(ky, den), grad_i(kz, den)
    aux = -2 * (grad_i(kx, df_dgn2 * dndx) + grad_i(ky, df_dgn2 * dndy)
                + grad_i(kz, df_dgn2 * dndz))
    return df_dn + aux


# -------  analytic stresses  -------

def hartree_stress(box_vecs, den):
    vol = volume(box_vecs)
    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)

    factor = np.full(k2.shape, 8 * np.pi)
    if den.shape[2] % 2 == 0:
        factor[:, :, k2.shape[2] - 1] = 4 * np.pi
    factor[:, :, 0] = 4 * np.pi
    factor[0, 0, 0] = 0.0
    factor = jnp.asarray(factor)

    den_ft = jnp.fft.rfftn(den, norm="forward")
    aux = (den_ft.real**2 + den_ft.imag**2) / (k2**2 + 1e-30)

    ks = [kx, ky, kz]
    term1 = jnp.asarray([[jnp.sum(factor * aux * ks[i] * ks[j])
                          for j in range(3)] for i in range(3)])
    term2 = -Hartree(box_vecs, den) / vol * jnp.eye(3)
    return term1 + term2


def TF_stress(box_vecs, den):
    return (-2 / 3 * ThomasFermi(box_vecs, den) / volume(box_vecs) * jnp.eye(3))


def vW_stress(box_vecs, den):
    kx, ky, kz, _ = wavevecs(box_vecs, den.shape)
    d = [grad_i(kx, den), grad_i(ky, den), grad_i(kz, den)]
    aux = jnp.asarray([[jnp.mean(d[i] * d[j] / den) for j in range(3)]
                       for i in range(3)])
    return -aux / 4


def _nl_stress_term2(box_vecs, den, alpha, beta, n0, k_F):
    kx, ky, kz, k2 = wavevecs(box_vecs, den.shape)
    filt = np.ones(k2.shape)
    if den.shape[2] % 2 == 0:
        filt[:, :, k2.shape[2] - 1] = 0.5
    filt[:, :, 0] = 0.5
    filt[0, 0, 0] = 0.0
    filt = jnp.asarray(filt)

    delta_n_a = jnp.fft.rfftn(den**alpha - n0**alpha, norm="forward")
    delta_n_b = jnp.conj(jnp.fft.rfftn(den**beta - n0**beta, norm="forward"))
    aux1 = (delta_n_a * delta_n_b + jnp.conj(delta_n_a) * jnp.conj(delta_n_b)).real

    k2s = k2 + 1e-30
    ks = [kx, ky, kz]
    eta = jnp.sqrt(k2) / (2 * k_F) + 1e-30
    lind = 0.5 + ((1 - eta * eta) / (4 * eta)) * jnp.log(jnp.abs((1 + eta) / (1 - eta)))
    aux3 = (eta / lind**2 * (0.5 / eta - 0.25 * (1 + 1 / (eta * eta))
                             * jnp.log(jnp.abs((1 + eta) / (1 - eta))))
            + 6 * eta * eta)

    def entry(i, j):
        a2 = ks[i] * ks[j] / k2s - (1 / 3 if i == j else 0.0)
        return jnp.sum(filt * aux1 * a2 * aux3)

    return jnp.asarray([[entry(i, j) for j in range(3)] for i in range(3)])


def non_local_KEF_stress(box_vecs, den, alpha=5 / 6, beta=5 / 6):
    vol = volume(box_vecs)
    T_lr = non_local_KEF(box_vecs, den, alpha, beta)
    term1 = -2 * T_lr / 3 / vol * jnp.eye(3)

    N_elec = float(jnp.mean(den) * vol)
    n0 = N_elec / vol
    k_F = (3 * np.pi**2 * n0) ** (1 / 3)
    prefactor = 0.5 * np.pi**2 / alpha / beta / n0 ** (alpha + beta - 2) / k_F
    term2 = _nl_stress_term2(box_vecs, den, alpha, beta, n0, k_F)

    LR_stress = term1 + prefactor * term2
    return TF_stress(box_vecs, den) + vW_stress(box_vecs, den) + LR_stress


def pauli_stabilized_stress(box_vecs, den, alpha=5 / 6, beta=5 / 6,
                            f=lambda x: 1 + x, fprime=lambda x: 1.0):
    T_TF = ThomasFermi(box_vecs, den)
    fp0 = fprime(jnp.zeros(()))
    T_NL = non_local_KEF(box_vecs, den, alpha, beta) / fp0
    X = T_NL / T_TF
    vol = volume(box_vecs)

    term1 = -2 * T_NL / 3 / vol * jnp.eye(3) * fprime(X)

    N_elec = float(jnp.mean(den) * vol)
    n0 = N_elec / vol
    k_F = (3 * np.pi**2 * n0) ** (1 / 3)
    prefactor = 0.5 * np.pi**2 / alpha / beta / n0 ** (alpha + beta - 2) / k_F
    term2 = _nl_stress_term2(box_vecs, den, alpha, beta, n0, k_F)
    term2 = term2 * prefactor * fprime(X) / fp0
    return (vW_stress(box_vecs, den)
            + TF_stress(box_vecs, den) * (f(X) - fprime(X) * X)
            + term1 + term2)


def _lda_style_stress(box_vecs, den, energy_fn, potential_fn):
    vol = volume(box_vecs)
    aux = energy_fn(box_vecs, den) - jnp.mean(potential_fn(box_vecs, den) * den) * vol
    return aux / vol * jnp.eye(3)


def lda_exchange_stress(box_vecs, den):
    return _lda_style_stress(box_vecs, den, lda_exchange, lda_exchange_potential)


def perdew_zunger_correlation_stress(box_vecs, den):
    return _lda_style_stress(box_vecs, den, perdew_zunger_correlation,
                             perdew_zunger_correlation_potential)


def perdew_wang_correlation_stress(box_vecs, den):
    return _lda_style_stress(box_vecs, den, perdew_wang_correlation,
                             perdew_wang_correlation_potential)


def chachiyo_correlation_stress(box_vecs, den):
    return _lda_style_stress(box_vecs, den, chachiyo_correlation,
                             chachiyo_correlation_potential)


def _gga_stress_term2(box_vecs, den, df_dgn2):
    kx, ky, kz, _ = wavevecs(box_vecs, den.shape)
    gdg = grad_dot_grad(kx, ky, kz, den)
    d = [grad_i(kx, den), grad_i(ky, den), grad_i(kz, den)]

    def entry(i, j):
        extra = gdg if i == j else 0.0
        return -2 * jnp.mean((extra + d[i] * d[j]) * df_dgn2)

    return jnp.asarray([[entry(i, j) for j in range(3)] for i in range(3)])


def pbe_exchange_stress(box_vecs, den):
    eps = -(3 / 4) * (3 / np.pi) ** (1 / 3) * den ** (1 / 3)
    deps_dn = -(1 / 4) * (3 / np.pi) ** (1 / 3) * den ** (-2 / 3)

    kx, ky, kz, _ = wavevecs(box_vecs, den.shape)
    s2 = reduced_gradient(kx, ky, kz, den) ** 2
    kappa, mu = 0.804, 0.066725 * np.pi**2 / 3
    Fx = 1 + kappa - kappa / (1 + mu / kappa * s2)
    ds2_dgn2 = 0.25 * (3 * np.pi**2) ** (-2 / 3) * den ** (-8 / 3)
    ds2_dn = -(8 / 3) * s2 / den
    dFx_ds2 = mu / (1 + mu / kappa * s2) ** 2

    df_dn = Fx * (deps_dn * den + eps) + dFx_ds2 * ds2_dn * eps * den
    df_dgn2 = dFx_ds2 * ds2_dgn2 * eps * den

    term1 = jnp.mean(Fx * eps * den - den * df_dn) * jnp.eye(3)
    return term1 + _gga_stress_term2(box_vecs, den, df_dgn2)


def pbe_correlation_stress(box_vecs, den):
    A1, alpha = 0.0310907, 0.2137
    b1, b2, b3, b4 = 7.5957, 3.5876, 1.6382, 0.49294
    rs = (3 / 4 / np.pi / den) ** (1 / 3)
    zeta = 2 * A1 * (b1 * rs**0.5 + b2 * rs + b3 * rs**1.5 + b4 * rs**2)
    eps_c = -2 * A1 * (1 + alpha * rs) * jnp.log(1 + 1 / zeta)
    deps_dn = (-rs / 3 / den
               * (-2 * A1 * alpha * jnp.log(1 + 1 / zeta)
                  + (2 * A1 * A1 * (1 + alpha * rs)
                     * (b1 * rs**-0.5 + 2 * b2 + 3 * b3 * rs**0.5 + 4 * b4 * rs)
                     / (zeta * (zeta + 1)))))

    beta, gamma = 0.066725, (1 - np.log(2)) / np.pi**2
    A = beta / gamma / (jnp.exp(-eps_c / gamma) - 1)
    dAdn = 1 / beta * A**2 * jnp.exp(-eps_c / gamma) * deps_dn

    kx, ky, kz, _ = wavevecs(box_vecs, den.shape)
    gdg = grad_dot_grad(kx, ky, kz, den)
    t2 = (1 / 16) * (np.pi / 3) ** (1 / 3) * gdg * den ** (-7 / 3)
    dt2dn = -7 / 3 * t2 / den
    dt2dgn2 = (1 / 16) * (np.pi / 3) ** (1 / 3) * den ** (-7 / 3)

    At2 = A * t2
    numer = 1 + At2
    denom = 1 + At2 + At2**2
    H = gamma * jnp.log(1 + beta / gamma * t2 * (numer / denom))

    numer2 = 1 + 2 * At2
    dHdn = beta * jnp.exp(-H / gamma) * (
        (dt2dn * numer2 + dAdn * t2**2) / denom
        - t2 * numer / denom**2 * (dt2dn * A * numer2 + dAdn * t2 * numer2))
    dH_dgn2 = beta * jnp.exp(-H / gamma) * (
        dt2dgn2 * numer2 / denom - At2 * numer / denom**2 * dt2dgn2 * numer2)

    df_dn = eps_c + H + den * (deps_dn + dHdn)
    df_dgn2 = den * dH_dgn2

    term1 = jnp.mean((eps_c + H) * den - den * df_dn) * jnp.eye(3)
    return term1 + _gga_stress_term2(box_vecs, den, df_dgn2)
