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

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.grid import inv3x3, _freq_indices

__all__ = ["prfftn", "pirfftn", "pwavevecs", "pconv", "make_penergy"]


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
