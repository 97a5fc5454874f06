"""Pencil-decomposed distributed 3-D real FFT (shard_map + all_to_all).

Why this exists: XLA's SPMD partitioner does not partition FFT ops — a
slab-sharded ``jnp.fft.rfftn`` under ``jit`` is lowered as a full-grid
all-gather on every device followed by a replicated transform (measured:
36 full-grid all-gathers in one WT energy+grad program on the 8-device CPU
mesh), and the *batched* sharded form does not execute at all on XLA:CPU
(fft_thunk.cc IsMonotonicWithDim0Major RET_CHECK).  Neither scales.

This module implements the standard scalable decomposition instead — the
"How to Scale Your Model" recipe, written by hand because the compiler
cannot infer it:

  real space: x sharded along axis 0           local (n0/P, n1, n2)
    1. local rfft along axis 2, fft along axis 1
    2. ``lax.all_to_all`` transpose: axis-0 shards -> axis-1 shards
       (the ONLY communication, riding ICI on a TPU mesh)
    3. local fft along axis 0
  k space: X sharded along axis 1              local (n0, n1/P, m2)

The inverse reverses the pipeline.  ``pwavevecs`` builds the matching
axis-1-sharded wavevector slabs (via ``lax.axis_index``), so spectral
kernels are evaluated directly on the local k-slab — no gathers anywhere.
``penergy_*`` helpers assemble full OFDFT energy terms in this layout with
a ``psum`` as the one scalar reduction.

Parity with the serial path is tested to 1e-12 relative on the 8-device
virtual CPU mesh (tests/test_parallel.py), and the compiled HLO is asserted
to contain all-to-all and NO full-grid all-gather.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.grid import inv3x3, _freq_indices
from ..utils.naming import term_name

__all__ = ["prfftn", "pirfftn", "prfftn_dc", "pirfftn_dc", "pwavevecs",
           "pconv", "make_penergy", "pmean", "pqmean", "pwmean",
           "penergy_wt_pbe", "pvalue_and_potential_wt_pbe",
           "penergy_terms", "pchi_value_and_grad_terms",
           "pchi_value_and_grad", "pchi_value_and_grad_analytic",
           "pencil_tpgd_minimize"]


def prfftn(x_local, axis_name="grid"):
    """Distributed rfftn body (call INSIDE shard_map).

    Args:
      x_local: the local real slab, (n0/P, n1, n2), sharded along axis 0.
    Returns:
      local k-slab of the half spectrum, (n0, n1/P, m2) complex — the
      global spectrum sharded along axis 1.
    """
    X = jnp.fft.rfft(x_local, axis=2)
    X = jnp.fft.fft(X, axis=1)
    # transpose the distributed axis: axis-0 slabs -> axis-1 pencils
    X = lax.all_to_all(X, axis_name, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(X, axis=0)


def pirfftn(X_local, shape, axis_name="grid"):
    """Inverse of :func:`prfftn` (call INSIDE shard_map); returns the local
    real slab (n0/P, n1, n2)."""
    X = jnp.fft.ifft(X_local, axis=0)
    X = lax.all_to_all(X, axis_name, split_axis=0, concat_axis=1, tiled=True)
    X = jnp.fft.ifft(X, axis=1)
    return jnp.fft.irfft(X, shape[2], axis=2)


def prfftn_dc(x_local, axis_name="grid"):
    """:func:`prfftn` with the f32 DC-split of ``ops.grid.rfftn`` (the
    global mean is carried around the backend transform exactly; see the
    serial docstring for the measured TPU DC-leak this removes).  The k=0
    coefficient lives on the axis-index-0 pencil only.  f64 passes
    through plain :func:`prfftn`.  Trailing batch axes (the ladder axis of
    a field-dependent convolution) are handled per slab."""
    if x_local.dtype != jnp.float32:
        return prfftn(x_local, axis_name)
    n_glob = (x_local.shape[0] * lax.axis_size(axis_name)
              * x_local.shape[1] * x_local.shape[2])
    xm = lax.psum(jnp.sum(x_local, axis=(0, 1, 2)), axis_name) / n_glob
    X = prfftn(x_local - xm, axis_name)
    own_dc = (lax.axis_index(axis_name) == 0).astype(X.real.dtype)
    return X.at[0, 0, 0].add(lax.complex(own_dc * xm * n_glob,
                                         jnp.zeros_like(xm)))


def pirfftn_dc(X_local, shape, axis_name="grid"):
    """Inverse of :func:`prfftn_dc` (DC carried as an exact uniform
    shift for complex64 spectra; others pass through).  Trailing batch
    axes are handled per slab."""
    if X_local.dtype != jnp.complex64:
        return pirfftn(X_local, shape, axis_name)
    own = (lax.axis_index(axis_name) == 0).astype(X_local.real.dtype)
    dc = lax.psum(own * jnp.real(X_local[0, 0, 0]), axis_name)
    X0 = X_local.at[0, 0, 0].multiply(1.0 - own)
    y = pirfftn(X0, shape, axis_name)
    n_glob = (y.shape[0] * lax.axis_size(axis_name)
              * y.shape[1] * y.shape[2])
    return y + dc / n_glob


def pwavevecs(box_vecs, shape, axis_name="grid"):
    """Wavevectors for the LOCAL k-slab (axis-1 pencil) of ``prfftn``'s
    output (call INSIDE shard_map).  Matches ops.grid.wavevecs (including
    the Nyquist sign rule) restricted to this device's slab."""
    dtype = box_vecs.dtype
    b = 2.0 * jnp.pi * inv3x3(box_vecs.T)
    nA, nB, nC = _freq_indices(shape)
    idx = lax.axis_index(axis_name)
    n_dev = lax.axis_size(axis_name)
    chunk = shape[1] // n_dev
    nB_slab = lax.dynamic_slice_in_dim(
        jnp.asarray(nB, dtype), idx * chunk, chunk, axis=1)
    nA = jnp.asarray(nA, dtype)
    nC = jnp.asarray(nC, dtype)
    kx = nA * b[0, 0] + nB_slab * b[1, 0] + nC * b[2, 0]
    ky = nA * b[0, 1] + nB_slab * b[1, 1] + nC * b[2, 1]
    kz = nA * b[0, 2] + nB_slab * b[1, 2] + nC * b[2, 2]
    k2 = kx * kx + ky * ky + kz * kz
    return kx, ky, kz, k2


def pconv(x_local, kern_fn, box_vecs, shape, axis_name="grid"):
    """Distributed spectral convolution irfftn(kern(k2) * rfftn(x)) (call
    INSIDE shard_map).  ``kern_fn(k2_slab) -> real kernel slab``."""
    _, _, _, k2 = pwavevecs(box_vecs, shape, axis_name)
    X = prfftn(x_local, axis_name)
    return pirfftn(kern_fn(k2) * X, shape, axis_name)


def make_penergy(term_body, mesh, shape, axis_name="grid"):
    """Wrap a shard_map energy body into a jittable global function.

    ``term_body(box_vecs, den_local) -> local scalar contribution`` (the
    body must psum its own mean reductions; see tests for a full WT+PBE
    example).  Returns ``fn(box_vecs, den)`` taking the globally sharded
    (or unsharded) density.
    """
    # check_vma=False: reverse-mode AD cotangents through the local FFTs
    # carry varying-axis annotations the static checker rejects; the
    # parity tests validate gradients numerically instead
    fn = shard_map(
        term_body, mesh=mesh,
        in_specs=(P(), P(axis_name, None, None)),
        out_specs=P(), check_vma=False)
    return jax.jit(fn)


# ---------------- full distributed energy bodies (WT + PBE set) -------------

def pmean(x_local, axis_name="grid"):
    """Global grid mean of an axis-0-sharded real field (inside shard_map)."""
    return lax.psum(jnp.sum(x_local), axis_name) / lax.psum(
        jnp.asarray(x_local.size, x_local.dtype), axis_name)


def pqmean(x_local, axis_name="grid"):
    """Distributed analogue of ops.grid.qmean: f64-accurate global mean for
    ENERGY accumulation on the f32 tier (local f32 column sums combined in
    emulated f64, then one f64 psum) — without it the dE < 1e-7 eV stopping
    rule is undetectable in f32.  f64 inputs take the plain path."""
    if x_local.dtype != jnp.float32:
        return pmean(x_local, axis_name)
    cols = 512
    n = x_local.size
    pad = (-n) % cols
    xf = x_local.reshape(-1)
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), x_local.dtype)])
    partial = jnp.sum(xf.reshape(-1, cols), axis=0)
    s_local = jnp.sum(partial.astype(jnp.float64))
    tot = lax.psum(s_local, axis_name)
    N = lax.psum(jnp.asarray(n, jnp.float64), axis_name)
    return tot / N


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def _pwmean32(x_local, axis_name):
    return pqmean(x_local, axis_name).astype(jnp.float32)


@_pwmean32.defjvp
def _pwmean32_jvp(axis_name, primals, tangents):
    x, = primals
    t, = tangents
    return _pwmean32(x, axis_name), pmean(t, axis_name)


def pwmean(x_local, axis_name="grid"):
    """Distributed analogue of ops.grid.wmean: working-dtype accurate
    global mean for means that FEED array arithmetic (N_tilde, mu).  Same
    column-sum + f64-psum as :func:`pqmean`, cast back to f32 so the
    graph never upcasts; linear custom_jvp so second-order autodiff
    composes.  See ops.grid.wmean for the measured f32 reduction-order
    hazard this removes (a 3e-6-relative N_tilde error shifts the total
    energy by mu*N*rho ~ 1e-5 Ha)."""
    if x_local.dtype != jnp.float32:
        return pmean(x_local, axis_name)
    return _pwmean32(x_local, axis_name)


def penergy_wt_pbe(box_vecs, den_local, v_ext_local, shape,
                   axis_name="grid"):
    """Complete fcc-Al-style energy — IonElectron + Hartree + WangTeter +
    PBE — evaluated distributed (call INSIDE shard_map / via shard_map):
    every FFT is a pencil transform with one all_to_all, every reduction a
    psum; nothing is ever gathered.

    Mirrors the serial terms in models/{interaction,kinetic_*,xc}.py; kept
    in the parallel package as the reference distributed implementation
    (the serial module functions trace with jnp.fft and cannot be reused
    inside shard_map without the compiler falling back to all-gathers).
    """
    from ..models.kinetic_local import TF_COEFF
    from ..models.xc import _pbe_exchange_density, _pbe_correlation_density

    vol = jnp.abs(jnp.linalg.det(box_vecs))
    kx, ky, kz, k2 = pwavevecs(box_vecs, shape, axis_name)

    den_ft = prfftn(den_local, axis_name)

    # --- IonElectron ------------------------------------------------------
    E_ie = pmean(den_local * v_ext_local, axis_name) * vol

    # --- Hartree ----------------------------------------------------------
    nz = k2 != 0
    coul = jnp.where(nz, 4.0 * np.pi / jnp.where(nz, k2, 1.0), 0.0)
    v_h = pirfftn(coul * den_ft, shape, axis_name)
    E_h = 0.5 * pmean(den_local * v_h, axis_name) * vol

    # --- gradient fields (PBE) -------------------------------------------
    def igrad(ki):
        return pirfftn(lax.complex(-ki * jnp.imag(den_ft),
                                   ki * jnp.real(den_ft)), shape, axis_name)

    gx, gy, gz = igrad(kx), igrad(ky), igrad(kz)
    gdg = gx * gx + gy * gy + gz * gz

    # --- Weizsaecker (Laplacian form, matching the serial term: the
    # gradient form differs at O(1e-3) on a discrete grid because sqrt(n)
    # is not band-limited — integration by parts is only exact for the
    # spectral derivatives of the SAME field) ------------------------------
    sqrt_den = jnp.sqrt(den_local)
    lap_den = pirfftn(-k2 * den_ft, shape, axis_name)
    lap_sqrt = pirfftn(-k2 * prfftn(sqrt_den, axis_name), shape, axis_name)
    E_vw = pmean(0.25 * lap_den - 0.5 * sqrt_den * lap_sqrt,
                 axis_name) * vol

    # --- ThomasFermi ------------------------------------------------------
    E_tf = TF_COEFF * pmean(den_local ** (5.0 / 3.0), axis_name) * vol

    # --- WangTeter nonlocal (same Lindhard helper as the serial path) -----
    from ..models.kinetic_nonlocal import G_inv_lind
    from ..ops.grid import safe_sqrt

    alpha = beta = 5.0 / 6.0
    # detach the electron NUMBER only — n0 = N/vol stays differentiable
    # through the cell volume, exactly like the serial G_inv_lindhard
    n0 = lax.stop_gradient(pmean(den_local, axis_name) * vol) / vol
    k_F = (3.0 * np.pi ** 2 * n0) ** (1.0 / 3.0)
    eta = safe_sqrt(k2) / (2.0 * k_F)
    G_inv = G_inv_lind(eta)
    kern = (5.0 / (9.0 * alpha * beta * n0 ** (alpha + beta - 5.0 / 3.0))
            * (1.0 / G_inv - 3.0 * eta * eta - 1.0))
    dnb = den_local ** beta - n0 ** beta
    conv = pirfftn(kern * prfftn(dnb, axis_name), shape, axis_name)
    E_wt = TF_COEFF * pmean((den_local ** alpha - n0 ** alpha) * conv,
                            axis_name) * vol

    # --- PBE XC -----------------------------------------------------------
    ex = _pbe_exchange_density(den_local, gdg)
    ec = _pbe_correlation_density(den_local, gdg)
    E_xc = pmean(ex + ec, axis_name) * vol

    return E_ie + E_h + E_vw + E_tf + E_wt + E_xc


def pvalue_and_potential_wt_pbe(box_vecs, den_local, v_ext_local, shape,
                                axis_name="grid"):
    """Distributed fused (E, dE/dn): the pencil-FFT analogue of
    models/potentials.py for the IonElectron + Hartree + WangTeter + PBE
    set (call INSIDE shard_map).

    Returns (global scalar E, local potential slab).  Same 13-transform
    forward sweep as the serial analytic path — every transform a pencil
    FFT with one all_to_all, every reduction a psum; no gathers, no
    reverse-mode residuals.  This is the production multi-chip gradient.
    """
    from ..models.kinetic_local import TF_COEFF
    from ..models.kinetic_nonlocal import G_inv_lind
    from ..models.xc import _pbe_exchange_density, _pbe_correlation_density
    from ..ops.grid import safe_sqrt, powr

    vol = jnp.abs(jnp.linalg.det(box_vecs))
    kx, ky, kz, k2 = pwavevecs(box_vecs, shape, axis_name)
    den_ft = prfftn(den_local, axis_name)

    # IonElectron
    E = pqmean(den_local * v_ext_local, axis_name) * vol
    pot = v_ext_local

    # Hartree
    nz = k2 != 0
    coul = jnp.where(nz, 4.0 * np.pi / jnp.where(nz, k2, 1.0), 0.0)
    v_h = pirfftn(coul * den_ft, shape, axis_name)
    E = E + 0.5 * pqmean(den_local * v_h, axis_name) * vol
    pot = pot + v_h

    # ThomasFermi
    E = E + TF_COEFF * pqmean(powr(den_local, 5.0 / 3.0), axis_name) * vol
    pot = pot + (5.0 / 3.0) * TF_COEFF * powr(den_local, 2.0 / 3.0)

    # Weizsaecker (Laplacian form; 1/4 lap n integrates to zero exactly)
    sqrt_den = safe_sqrt(den_local)
    lap_s = pirfftn(-k2 * prfftn(sqrt_den, axis_name), shape, axis_name)
    E = E - 0.5 * pqmean(sqrt_den * lap_s, axis_name) * vol
    pos = den_local > 0
    pot = pot + jnp.where(
        pos, -0.5 * lap_s / jnp.where(pos, sqrt_den, 1.0), 0.0)

    # WangTeter nonlocal (alpha = beta = 5/6)
    alpha = beta = 5.0 / 6.0
    n0 = lax.stop_gradient(pmean(den_local, axis_name) * vol) / vol
    k_F = (3.0 * np.pi ** 2 * n0) ** (1.0 / 3.0)
    eta = safe_sqrt(k2) / (2.0 * k_F)
    G_inv = G_inv_lind(eta)
    kern = (5.0 / (9.0 * alpha * beta * n0 ** (alpha + beta - 5.0 / 3.0))
            * (1.0 / G_inv - 3.0 * eta * eta - 1.0))
    d_a = powr(den_local, alpha) - n0 ** alpha
    conv = pirfftn(kern * prfftn(d_a, axis_name), shape, axis_name)
    E = E + TF_COEFF * pqmean(d_a * conv, axis_name) * vol
    pot = pot + TF_COEFF * 2.0 * alpha * powr(den_local, alpha - 1.0) * conv

    # PBE x + c: shared gradient fields, combined divergence
    def igrad(ki):
        return pirfftn(lax.complex(-ki * jnp.imag(den_ft),
                                   ki * jnp.real(den_ft)), shape, axis_name)

    gx, gy, gz = igrad(kx), igrad(ky), igrad(kz)
    gdg = gx * gx + gy * gy + gz * gz
    E = E + pqmean(_pbe_exchange_density(den_local, gdg)
                   + _pbe_correlation_density(den_local, gdg),
                   axis_name) * vol

    den = den_local
    epsx = -(3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0) * powr(den, 1.0 / 3.0)
    depsx = -(1.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0) * powr(den, -2.0 / 3.0)
    s2 = 0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0) * gdg * powr(den, -8.0 / 3.0)
    kap, mu_x = 0.804, 0.066725 * np.pi**2 / 3.0
    dFx_ds2 = mu_x / (1.0 + mu_x / kap * s2) ** 2
    Fx = 1.0 + kap - kap / (1.0 + mu_x / kap * s2)
    ds2_dgn2 = 0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0) * powr(den, -8.0 / 3.0)
    ds2_dn = -(8.0 / 3.0) * s2 / den
    df_dn_x = Fx * (depsx * den + epsx) + dFx_ds2 * ds2_dn * epsx * den
    df_dgn2_x = dFx_ds2 * ds2_dgn2 * epsx * den

    from ..models.potentials import _pw92_eps_and_deriv
    from ..ops.grid import log_hp
    eps_c, deps_dn_c = _pw92_eps_and_deriv(den)
    beta_c, gamma = 0.066725, float(1.0 - np.log(2.0)) / np.pi**2
    A = beta_c / gamma / (jnp.exp(-eps_c / gamma) - 1.0 + 1e-30)
    dAdn = 1.0 / beta_c * A * A * jnp.exp(-eps_c / gamma) * deps_dn_c
    t2 = ((1.0 / 16.0) * (np.pi / 3.0) ** (1.0 / 3.0)
          * gdg / (powr(den, 7.0 / 3.0) + 1e-30))
    dt2dn = -7.0 / 3.0 * t2 / den
    dt2dgn2 = (1.0 / 16.0) * (np.pi / 3.0) ** (1.0 / 3.0) / (
        powr(den, 7.0 / 3.0) + 1e-30)
    At2 = A * t2
    numer = 1.0 + At2
    denom = 1.0 + At2 + At2 * At2
    H = gamma * log_hp(1.0 + beta_c / gamma * t2 * (numer / denom))
    numer2 = 1.0 + 2.0 * At2
    eH = jnp.exp(-H / gamma)
    dHdn = beta_c * eH * (
        (dt2dn * numer2 + dAdn * t2 * t2) / denom
        - t2 * numer / denom**2 * (dt2dn * A * numer2 + dAdn * t2 * numer2))
    dH_dgn2 = beta_c * eH * (
        dt2dgn2 * numer2 / denom
        - At2 * numer / denom**2 * dt2dgn2 * numer2)
    df_dn_c = eps_c + H + den * (deps_dn_c + dHdn)
    df_dgn2_c = den * dH_dgn2

    w = df_dgn2_x + df_dgn2_c
    Fv = (prfftn(w * gx, axis_name) * 1.0, prfftn(w * gy, axis_name),
          prfftn(w * gz, axis_name))
    div_ft = (lax.complex(-kx * jnp.imag(Fv[0]), kx * jnp.real(Fv[0]))
              + lax.complex(-ky * jnp.imag(Fv[1]), ky * jnp.real(Fv[1]))
              + lax.complex(-kz * jnp.imag(Fv[2]), kz * jnp.real(Fv[2])))
    aux = -2.0 * pirfftn(div_ft, shape, axis_name)
    pot = pot + df_dn_x + df_dn_c + aux
    return E, pot


def pchi_value_and_grad(chi_local_flat, box_vecs, v_ext_local, N_elec,
                        shape, axis_name="grid"):
    """Distributed chi-parameterized (E, dE/dchi): the SPMD analogue of
    System._chi_value_and_grad_analytic (call INSIDE shard_map).

    ``chi_local_flat``: this device's contiguous block of the flat chi
    vector (= its slab, row-major).  Returns (global scalar E, local flat
    gradient shard).
    """
    n_dev = lax.axis_size(axis_name)
    local_shape = (shape[0] // n_dev, shape[1], shape[2])
    chi = chi_local_flat.reshape(local_shape)
    vol = jnp.abs(jnp.linalg.det(box_vecs))
    N_tilde = pwmean(chi * chi, axis_name) * vol
    den_pre = (N_elec / N_tilde) * chi * chi
    if chi.dtype == jnp.float32:
        c = 1e-10 * N_elec / vol
        s = N_elec / (N_elec + c * vol)
        den = (den_pre + c) * s
    else:
        s = 1.0
        den = den_pre
    E, pot = pvalue_and_potential_wt_pbe(box_vecs, den, v_ext_local, shape,
                                         axis_name)
    quad_w = vol / (shape[0] * shape[1] * shape[2])
    mu = pwmean(pot * den_pre, axis_name) * vol / N_elec
    dEdchi = s * (N_elec / N_tilde) * 2.0 * chi * (pot - mu) * quad_w
    return E, dEdchi.reshape(-1)


def pchi_value_and_grad_analytic(terms, chi_local_flat, box_vecs,
                                 v_ext_local, N_elec, shape,
                                 axis_name="grid", aux=None):
    """Distributed chi-parameterized (E, dE/dchi) from the GENERIC fused
    analytic potentials (call INSIDE shard_map): the serial
    ``models.potentials.value_and_potential`` sweep runs under
    ``ops.grid.pencil_mode`` — every transform a pencil FFT, every
    reduction a psum, kernel-slab aux hoists sharded to the k-pencil —
    so ANY supported term set gets the fused forward-sweep gradient
    distributed (one sweep, shared spectra, no reverse-mode residuals).
    Supersedes the hand-written :func:`pchi_value_and_grad` (kept as the
    WT+PBE benchmark/reference of this generic path).
    """
    from ..ops.grid import pencil_mode
    from ..models.potentials import value_and_potential

    n_dev = lax.axis_size(axis_name)
    local_shape = (shape[0] // n_dev, shape[1], shape[2])
    chi = chi_local_flat.reshape(local_shape)
    vol = jnp.abs(jnp.linalg.det(box_vecs))
    N_tilde = pwmean(chi * chi, axis_name) * vol
    den_pre = (N_elec / N_tilde) * chi * chi
    if chi.dtype == jnp.float32:
        c = 1e-10 * N_elec / vol
        s = N_elec / (N_elec + c * vol)
        den = (den_pre + c) * s
    else:
        s = 1.0
        den = den_pre
    with pencil_mode(axis_name):
        E, pot = value_and_potential(terms, box_vecs, den, v_ext_local,
                                     N_elec=N_elec, aux=aux)
    quad_w = vol / (shape[0] * shape[1] * shape[2])
    mu = pwmean(pot * den_pre, axis_name) * vol / N_elec
    dEdchi = s * (N_elec / N_tilde) * 2.0 * chi * (pot - mu) * quad_w
    return E, dEdchi.reshape(-1)


def penergy_terms(terms, box_vecs, den_local, v_ext_local,
                  axis_name="grid", aux=None):
    """GENERIC distributed energy: evaluates the SERIAL term bodies inside
    shard_map under ``ops.grid.pencil_mode`` (call INSIDE shard_map).

    The serial functionals in ``models/`` are written against the core
    spectral primitives (rfftn/irfftn/wavevecs/qmean/wmean); the pencil
    context redirects those to this module's SPMD implementations, so ANY
    fixed-kernel term — the whole WT family, WGC99's Taylor kernels,
    FoleyMadden's 11 convolutions, KGAP, XWM, every semi-local/GGA term —
    runs distributed with automatic parity to its serial form (same body,
    same floating-point recipe).  Ladder-based terms (Huang-Carter family,
    spline YukawaGGA, MGP) work too — the field-dependent convolution's
    trailing ladder axis rides one batched all_to_all — provided their
    ``prepare()`` has been called (static ladder; the terms raise their
    own RuntimeError otherwise).  Only the naive O(N^2) Yukawa oracle has
    no distributed form.

    Mirrors ``System._density_terms_energy``'s dispatch (IonIon excluded,
    IonElectron takes the external-potential slab), including the
    term-aux protocol: ``aux`` is the ``System._collect_term_aux`` list
    whose k-space arrays must be SHARDED to the axis-1 k-pencil (see
    :func:`aux_pencil_specs`) — the hoisted HC kernel slabs then ride the
    distributed path exactly like the serial jitted optimizer.
    """
    from ..ops.grid import pencil_mode

    E = jnp.zeros((), dtype=den_local.dtype)
    with pencil_mode(axis_name):
        for i, f in enumerate(terms):
            nm = term_name(f)
            a = aux[i] if aux is not None else None
            if a is not None:
                owner = getattr(f, "__self__", f)
                E = E + owner.apply_aux(a, box_vecs, den_local)
            elif nm == "IonIon":
                continue
            elif nm == "IonElectron":
                E = E + f(box_vecs, den_local, v_ext_local)
            else:
                E = E + f(box_vecs, den_local)
    return E


def aux_pencil_specs(aux, axis_name="grid"):
    """PartitionSpecs sharding a term-aux pytree to the pencil k-layout:
    arrays with >= 3 dims are half-spectrum-shaped (n0, n1, m2[, L]) and
    shard along axis 1 (the k-pencil axis); small tables/ladders
    replicate."""
    def spec(a):
        nd = jnp.ndim(a)
        if nd >= 3:
            return P(*((None, axis_name) + (None,) * (nd - 2)))
        return P()
    return jax.tree_util.tree_map(spec, aux)


def pchi_value_and_grad_terms(terms, chi_local_flat, box_vecs, v_ext_local,
                              N_elec, shape, axis_name="grid", aux=None):
    """Distributed chi-parameterized (E, dE/dchi) for an ARBITRARY
    fixed-kernel term list via reverse-mode autodiff of
    :func:`penergy_terms` (call INSIDE shard_map).  The psum'd scalar is
    replicated, so per-device ``jax.value_and_grad`` of the local-shard
    energy IS the global gradient shard."""
    n_dev = lax.axis_size(axis_name)
    local_shape = (shape[0] // n_dev, shape[1], shape[2])

    def chi_to_E(chi_flat):
        chi = chi_flat.reshape(local_shape)
        vol = jnp.abs(jnp.linalg.det(box_vecs))
        N_tilde = pwmean(chi * chi, axis_name) * vol
        den = (N_elec / N_tilde) * chi * chi
        if chi.dtype == jnp.float32:
            c = 1e-10 * N_elec / vol
            den = (den + c) * (N_elec / (N_elec + c * vol))
        return penergy_terms(terms, box_vecs, den, v_ext_local, axis_name,
                             aux=aux)

    E, g = jax.value_and_grad(chi_to_E)(chi_local_flat)
    # Differentiating a replicated (psum'd) scalar INSIDE shard_map: the
    # terminal psum transposes to a psum of the replicated unit cotangent,
    # so the per-device gradient carries one uniform factor of the axis
    # size (intermediate psums — pwmean's N_tilde — act as the correct
    # global combiners for device-varying cotangents and add no further
    # factor).  Normalize here; the parity test
    # (tests/test_parallel_generic.py::test_generic_pencil_chi_gradient_parity)
    # pins this against the serial gradient at 1e-11, so any change in
    # JAX's psum-transpose semantics is caught immediately.
    return E, g / n_dev


def pencil_tpgd_minimize(mesh, shape, box_vecs, v_ext, N_elec, chi0,
                         M_kernel, lr=1.0, ntol=1e-7, conv_count=3,
                         max_iter=1000, skip_iters=2, f_scale=27.211386245988,
                         axis_name="grid", method="TPGD", terms=None,
                         aux=None, block=1, analytic=False):
    """Whole distributed density optimization as ONE SPMD program.

    The full production solver — exact-preconditioned TPGD with the dE
    stopping rule — run under ``shard_map``: pencil FFTs (one all_to_all
    per transform), psum reductions, psum'd BB inner products
    (ops/solvers.py ``axis_name`` mode).  NOTHING is ever gathered; the
    per-device working set is the full problem divided by the mesh size,
    which is what makes >single-chip grids reachable.

    Args mirror ``System._jit_tpgd_full``; ``M_kernel`` is the exact
    uniform-density preconditioner diagonal (half-spectrum, global — it is
    sharded along k-axis 1 automatically), or ``None`` to run without a
    preconditioner (the solvers' plain BB / identity-H0 forms).  ``block``
    is the LBFGS stopping-rule evaluation period (iterations per
    convergence check; TPGD checks every iteration regardless).  Returns
    (state, iters, converged) with state.x sharded like ``chi0``.

    Gradient selection: ``terms=None`` uses the hand-fused analytic
    WT+PBE gradient (:func:`pchi_value_and_grad` — kept as the benchmark
    and cross-check of the generic path); a term list with
    ``analytic=True`` drives the GENERIC fused analytic gradient
    (:func:`pchi_value_and_grad_analytic` — any term set
    ``models.potentials.supported_terms`` accepts, the production
    multi-chip form); a term list with ``analytic=False`` the generic
    reverse-mode autodiff gradient (:func:`pchi_value_and_grad_terms` —
    any fixed-kernel functional set, incl. arbitrary user callables).
    """
    from jax.sharding import NamedSharding
    from ..ops import solvers

    n_dev = mesh.shape[axis_name]
    if shape[0] % n_dev or shape[1] % n_dev:
        raise ValueError(
            f"pencil decomposition needs grid axes 0 and 1 divisible by the "
            f"mesh '{axis_name}' size {n_dev}; got shape {tuple(shape)} "
            f"(pad the grid or choose a compatible mesh).")

    P_ = P
    flat = P_(axis_name)

    def body(chi_local, box, vext_local, M_slab, aux_local):
        n_dev = lax.axis_size(axis_name)
        local_shape = (shape[0] // n_dev, shape[1], shape[2])

        if terms is None:
            vg = lambda x: pchi_value_and_grad(x, box, vext_local, N_elec,
                                               shape, axis_name)
        elif analytic:
            vg = lambda x: pchi_value_and_grad_analytic(
                terms, x, box, vext_local, N_elec, shape, axis_name,
                aux=aux_local)
        else:
            vg = lambda x: pchi_value_and_grad_terms(
                terms, x, box, vext_local, N_elec, shape, axis_name,
                aux=aux_local)

        if M_slab is None:
            aH0 = None
        else:
            def aH0(q):
                X = prfftn(q.reshape(local_shape), axis_name)
                return pirfftn(M_slab * X, shape, axis_name).reshape(q.shape)

        if method == "LBFGS":
            return solvers.lbfgs_minimize(vg, chi_local, lr=lr, ntol=ntol,
                                          conv_count=conv_count,
                                          max_iter=max_iter, f_scale=f_scale,
                                          apply_H0=aH0, block=block,
                                          skip_iters=skip_iters,
                                          axis_name=axis_name,
                                          freeze_lanes=False)
        return solvers.tpgd_minimize(vg, chi_local, lr=lr, ntol=ntol,
                                     conv_count=conv_count,
                                     max_iter=max_iter, f_scale=f_scale,
                                     apply_H0=aH0, skip_iters=skip_iters,
                                     axis_name=axis_name, freeze_lanes=False)

    if method == "LBFGS":
        # ring buffers hold flat LOCAL vectors: shard their last axis
        st_specs = solvers.LBFGSState(
            x=flat, f=P_(), g=flat, g_prev=flat,
            S=P_(None, axis_name), Y=P_(None, axis_name), rho=P_(),
            H_diag=P_(), t_prev=P_(), d_prev=flat, n_iter=P_())
    else:
        st_specs = solvers.TPGDState(x=flat, f=P_(), g=flat,
                                     g_prev=flat, Mg_prev=flat, s_prev=flat,
                                     n_iter=P_())
    aux_specs = aux_pencil_specs(aux, axis_name)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(flat, P_(), P_(axis_name, None, None),
                  P_(None, axis_name, None), aux_specs),
        out_specs=(st_specs, P_(), P_()), check_vma=False)

    chi0 = jax.device_put(chi0, NamedSharding(mesh, flat))
    v_ext = jax.device_put(v_ext, NamedSharding(mesh, P_(axis_name, None,
                                                         None)))
    if M_kernel is not None:
        M_kernel = jax.device_put(
            M_kernel, NamedSharding(mesh, P_(None, axis_name, None)))
    aux = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), aux,
        aux_specs)
    return jax.jit(fn)(chi0, box_vecs, v_ext, M_kernel, aux)
