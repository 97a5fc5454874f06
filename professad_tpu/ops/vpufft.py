"""Pallas TPU VPU-butterfly FFT building block (round-4 groundwork).

Motivation (docs/design.md "Where the iteration time actually goes"): the
production iteration is FFT-bound at the backend's achieved rate, and at
256^3 the backend's marginal in-program cost per transform is ~9x the
idealized 3-pass streaming bound.  The only remaining lever is a
hand-written FFT.  Round 2/3 closed the MXU matmul-DFT route (dense-DFT
FLOPs at usable precision exceed MXU speed-of-light vs the backend); this
module starts the VPU BUTTERFLY route, whose FLOPs are ~30x lower.

What exists and is measured (v5e, f32):

- ``fft_sublane(xr, xi)``: radix-2 Stockham FFT along axis 0 (sublanes)
  of an (n, B) batch, complex carried as separate (re, im) f32 arrays,
  n a power of two.  Stage s combines contiguous half-blocks with
  broadcast twiddles and doubles the transform axis by concatenation —
  no gathers, no lane shuffles, Mosaic-clean.  Lanes are processed in
  640-wide grid chunks (the full-width block holds ~15 live stage
  temporaries and overflows the 16 MB VMEM scoped stack).
  Correctness: 1.5e-7 relative vs ``jnp.fft.fft`` at n=128, B=8320
  (the production half-spectrum x-axis shape).  Speed: marginal
  0.038 ms/call in a chained program vs the backend's 0.033 ms for the
  same shape — a TIE in the VMEM-warm regime.

Measured guidance for the full 3-D composition (round 5):

- Do NOT transpose inside the kernel: a per-x-slab pass doing
  z-butterfly -> in-kernel transpose -> y-butterfly measured 77 ms for
  128^3 (the whole backend conv pair is ~0.27 ms) — Mosaic lowers the
  (128, 128) transposes and narrow blocks pathologically.
- The y axis can butterfly WITHOUT a transpose: grid over axis-0 chunks
  with 3-D blocks (chunk, n1, m2); slicing the middle (sublane-group)
  axis is as clean as axis 0.
- The z (last, lanes) axis is the open problem: butterflies across
  lanes need either an XLA-level transpose sandwich (2 extra HBM
  passes) or a lane-rotation-based scheme.
- Isolated VMEM-warm microbenchmarks CANNOT justify the build (backend
  and Pallas tie there); the decision measurement is the production
  iteration at 256^3, where the backend's in-context marginal is
  ~2.3 ms/transform (15 transforms = ~35 of 52 ms/iter).

No production call sites yet — ``ops.pallas_fft`` (MXU) remains the
``set_conv_mode("pallas")`` implementation; this module is exercised by
tests/test_pallas_fft.py's vpufft tests.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fft_sublane", "ifft_sublane"]

_I0 = np.int32(0)


@lru_cache(maxsize=None)
def _twiddles(n, inverse):
    """Per-stage Stockham twiddles w_l(k) = exp(-+2 pi i k / (2 l)) as
    host f32 arrays, stage l = 1, 2, ..., n/2."""
    sign = 2.0 if inverse else -2.0
    re, im, l = [], [], 1
    while l < n:
        k = np.arange(l)
        ang = sign * np.pi * k / (2 * l)
        re.append(np.cos(ang).astype(np.float32))
        im.append(np.sin(ang).astype(np.float32))
        l *= 2
    return re, im


def _stockham_body(xr, xi, tws, n, chunk):
    """The unrolled radix-2 Stockham sweep on (n, chunk) f32 values.

    View the state as (m groups, l transform length, chunk lanes); each
    stage halves m and doubles l via one contiguous slice + twiddled
    combine + concatenation.  All shapes static; no gathers.
    """
    xr = xr.reshape(n, 1, chunk)
    xi = xi.reshape(n, 1, chunk)
    m, l, s = n, 1, 0
    while l < n:
        wr = tws[2 * s].reshape(1, l, 1)
        wi = tws[2 * s + 1].reshape(1, l, 1)
        tr, ti = xr[: m // 2], xi[: m // 2]
        br, bi = xr[m // 2:], xi[m // 2:]
        pr = wr * br - wi * bi
        pi_ = wr * bi + wi * br
        xr = jnp.concatenate([tr + pr, tr - pr], axis=1)
        xi = jnp.concatenate([ti + pi_, ti - pi_], axis=1)
        m //= 2
        l *= 2
        s += 1
    return xr.reshape(n, chunk), xi.reshape(n, chunk)


def _pick_chunk(B):
    """Largest lane chunk that divides B, is a multiple of 128, and keeps
    the ~15 live stage temporaries inside the VMEM scoped stack."""
    for c in (640, 512, 384, 256, 128):
        if B % c == 0:
            return c
    return B  # small odd batch: single block


@lru_cache(maxsize=None)
def _fft_call(n, B, inverse, interpret):
    from jax.experimental import pallas as pl

    if n & (n - 1):
        raise ValueError(f"fft_sublane needs a power-of-two axis, got {n}")
    chunk = _pick_chunk(B)
    tw_re, tw_im = _twiddles(n, inverse)
    tw_host = []
    for a, b in zip(tw_re, tw_im):
        tw_host += [a, b]
    scale = np.float32(1.0 / n) if inverse else None

    def kernel(xr_ref, xi_ref, *rest):
        tws = [r[:] for r in rest[:-2]]
        or_ref, oi_ref = rest[-2:]
        yr, yi = _stockham_body(xr_ref[:], xi_ref[:], tws, n, chunk)
        if scale is not None:
            yr = yr * scale
            yi = yi * scale
        or_ref[:] = yr
        oi_ref[:] = yi

    data_spec = pl.BlockSpec((n, chunk), lambda j: (_I0, j))
    tw_specs = [pl.BlockSpec(t.shape, lambda j: (_I0,)) for t in tw_host]
    call = pl.pallas_call(
        kernel,
        grid=(B // chunk,),
        in_specs=[data_spec, data_spec] + tw_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((n, B), jnp.float32),
                   jax.ShapeDtypeStruct((n, B), jnp.float32)),
        interpret=interpret,
    )
    tw_dev = [jnp.asarray(t) for t in tw_host]
    return lambda xr, xi: call(xr, xi, *tw_dev)


def fft_sublane(xr, xi, interpret=False):
    """Forward DFT along axis 0 of an (n, B) f32 batch (n = power of 2),
    complex as (re, im).  Matches ``jnp.fft.fft(xr + 1j xi, axis=0)``."""
    n, B = xr.shape
    return _fft_call(int(n), int(B), False, interpret)(xr, xi)


def ifft_sublane(xr, xi, interpret=False):
    """Inverse (1/n-normalized) DFT along axis 0; matches
    ``jnp.fft.ifft(xr + 1j xi, axis=0)``."""
    n, B = xr.shape
    return _fft_call(int(n), int(B), True, interpret)(xr, xi)
