"""High-precision real 3-D FFTs as explicit MXU matmuls (optional path).

Context: the TPU f32-tier accuracy problem of round 2 turned out to be the
``pow``/``log`` approximations (fixed by ``ops.grid.powr``/``log_hp``), NOT
the FFT — the builtin ``jnp.fft.rfftn`` measures 7.5e-7 relative at 128^3
on v5e, i.e. healthy f32.  This module exists as the alternative compute
path: DFT as dense matrix multiplication at ``jax.lax.Precision.HIGHEST``,
useful (a) as an accuracy cross-check against the backend FFT, (b) as a
building block for sharded/batched spectral ops where the backend FFT's
layout constraints bite (e.g. XLA:CPU's batched-sharded FFT RET_CHECK),
and (c) wherever the matmul formulation benchmarks faster than the builtin
on a given chip generation.

Design:

* Each 1-D stage is a dense DFT matmul (cos/sin tables, host-precomputed in
  f64 and cast).  For the grid sizes OFDFT uses (n <= a few hundred) the
  O(n) extra FLOPs per element are cheap on the MXU — the systolic array is
  exactly the right engine for length-n contractions — and XLA fuses the
  scale/twiddle elementwise work.
* Real-to-complex layout matches ``jnp.fft.rfftn`` exactly (half spectrum
  on the last axis, unnormalized forward, 1/N inverse), so these are
  drop-in replacements inside the energy terms.
* Complex arrays are carried as (real, imag) pairs internally — real
  matmuls map onto the MXU without C64 shuffling, and the pattern is
  transparent to autodiff.

The reference has no analogue (PyTorch cuFFT is f64-capable); this module
is the TPU-native answer to SURVEY.md section 7's "double-precision FFT
throughput on TPU" risk item.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["rfftn_hp", "irfftn_hp", "rfftn_pair", "irfftn_pair"]

_HI = jax.lax.Precision.HIGHEST


# Tables are cached as HOST numpy arrays (caching jnp arrays would leak
# tracers across jit scopes); jnp conversion happens per use site and is
# baked into each trace as a constant.

@lru_cache(maxsize=None)
def _rdft_tables_np(n, dtype_name):
    """Forward rDFT tables (n, n//2+1): cos and sin of -2 pi j k / n."""
    j = np.arange(n)[:, None]
    k = np.arange(n // 2 + 1)[None, :]
    ang = -2.0 * np.pi * j * k / n
    dt = np.dtype(dtype_name)
    return (np.cos(ang).astype(dt), np.sin(ang).astype(dt))


@lru_cache(maxsize=None)
def _dft_tables_np(n, dtype_name):
    """Full DFT tables (n, n): cos and sin of -2 pi j k / n."""
    j = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    ang = -2.0 * np.pi * j * k / n
    dt = np.dtype(dtype_name)
    return (np.cos(ang).astype(dt), np.sin(ang).astype(dt))


@lru_cache(maxsize=None)
def _irdft_tables_np(n, dtype_name):
    """Inverse rDFT tables (n//2+1, n) with Hermitian weights folded in:
    x_j = (1/n) sum_k w_k (Re X_k cos + Im X_k (-sin)), w = 2 except for
    the DC and (even-n) Nyquist bins."""
    m = n // 2 + 1
    k = np.arange(m)[:, None]
    j = np.arange(n)[None, :]
    ang = 2.0 * np.pi * j * k / n
    w = np.full((m, 1), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    dt = np.dtype(dtype_name)
    return ((w * np.cos(ang) / n).astype(dt),
            (-w * np.sin(ang) / n).astype(dt))


def _rdft_tables(n, dtype_name):
    C, S = _rdft_tables_np(n, dtype_name)
    return jnp.asarray(C), jnp.asarray(S)


def _dft_tables(n, dtype_name):
    C, S = _dft_tables_np(n, dtype_name)
    return jnp.asarray(C), jnp.asarray(S)


def _irdft_tables(n, dtype_name):
    C, S = _irdft_tables_np(n, dtype_name)
    return jnp.asarray(C), jnp.asarray(S)


def _mm_last(x, T):
    """Contract the last axis of ``x`` with table ``T`` at full precision."""
    return jnp.einsum("...j,jk->...k", x, T, precision=_HI)


def _cplx_dft_axis(re, im, axis):
    """Full complex DFT along ``axis`` (via 4 real matmuls on the MXU)."""
    n = re.shape[axis]
    C, S = _dft_tables(n, re.dtype.name)
    re_m = jnp.moveaxis(re, axis, -1)
    im_m = jnp.moveaxis(im, axis, -1)
    out_re = _mm_last(re_m, C) - _mm_last(im_m, S)
    out_im = _mm_last(re_m, S) + _mm_last(im_m, C)
    return jnp.moveaxis(out_re, -1, axis), jnp.moveaxis(out_im, -1, axis)


def _cplx_idft_axis(re, im, axis):
    """Unnormalized inverse complex DFT along ``axis`` (conjugate tables)."""
    n = re.shape[axis]
    C, S = _dft_tables(n, re.dtype.name)  # inverse: conjugate = flip sin sign
    re_m = jnp.moveaxis(re, axis, -1)
    im_m = jnp.moveaxis(im, axis, -1)
    out_re = _mm_last(re_m, C) + _mm_last(im_m, S)
    out_im = -_mm_last(re_m, S) + _mm_last(im_m, C)
    return jnp.moveaxis(out_re, -1, axis), jnp.moveaxis(out_im, -1, axis)


def rfftn_pair(x):
    """3-D real DFT returning the half spectrum as a (re, im) pair of REAL
    arrays — the complex-free form the on-TPU f64 tier needs (XLA:TPU has
    no complex128 type; the f64 *arithmetic* is emulated fine)."""
    Cr, Sr = _rdft_tables(x.shape[-1], x.dtype.name)
    re = _mm_last(x, Cr)
    im = _mm_last(x, Sr)
    re, im = _cplx_dft_axis(re, im, 1)
    re, im = _cplx_dft_axis(re, im, 0)
    return re, im


def irfftn_pair(re, im, shape):
    """Inverse of :func:`rfftn_pair` (1/N-normalized real output)."""
    # inverse transforms along the two full axes carry 1/n each via scaling
    re, im = _cplx_idft_axis(re, im, 0)
    re, im = _cplx_idft_axis(re, im, 1)
    n0, n1 = shape[0], shape[1]
    Ci, Si = _irdft_tables(shape[-1], re.dtype.name)
    out = _mm_last(re, Ci) + _mm_last(im, Si)
    return out / (n0 * n1)


def rfftn_hp(x):
    """``jnp.fft.rfftn`` equivalent for 3-D real input, full-precision MXU
    matmul implementation.  Returns complex64/complex128."""
    return jax.lax.complex(*rfftn_pair(x))


def irfftn_hp(X, shape):
    """``jnp.fft.irfftn`` equivalent (1/N-normalized) for the rfftn half
    spectrum, full-precision MXU matmul implementation."""
    return irfftn_pair(jnp.real(X), jnp.imag(X), shape)
