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

ROUND-5 GO/NO-GO RESULT: **NO-GO — the route is closed.**  The full 3-D
composition (``conv3_bfly``: real-input sublane forward, middle-axis
rank-3 Stockham, XLA transpose sandwich, FUSED z-step with the kernel
multiply riding the one VMEM residency where the full 3-D spectrum
exists) was built and measured against the backend
``irfftn(K * rfftn(x))`` pair in chained non-identical-input feedback
programs on the v5e: **0.98x (tie) at 128^3, 1.30x SLOWER at 256^3**
(8.134 vs 6.266 ms/pair), with composed-vs-backend f32 error growing to
1.2e-4 at 256^3 (~100x the backend's).  The loss is structural (c2c
bytes on x/y + the middle-axis kernel's ~2.7x-off-sublane rate); an
r2c-aware variant saves ~25% of bytes, not enough to flip 1.30x.  See
docs/design.md "Round-5 go/no-go".  This module is retained as tested
groundwork with NO production call sites by design; ``ops.pallas_fft``
(MXU) remains the ``set_conv_mode("pallas")`` implementation.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fft_sublane", "ifft_sublane", "fft_sublane_real",
           "ifft_sublane_real_out", "fft_mid", "ifft_mid", "sublane_conv",
           "conv3_bfly"]

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
    return lambda xr, xi: call(xr, xi, *tw_host)


@lru_cache(maxsize=None)
def _fft_real_call(n, B, interpret):
    """Forward sublane FFT of a REAL (n, B) batch: the imaginary input is
    synthesized as zeros in VMEM, saving one full HBM read vs feeding
    ``fft_sublane`` a zero buffer."""
    from jax.experimental import pallas as pl

    if n & (n - 1):
        raise ValueError(f"fft_sublane_real needs a power-of-two axis, got {n}")
    chunk = _pick_chunk(B)
    tw_re, tw_im = _twiddles(n, False)
    tw_host = []
    for a, b in zip(tw_re, tw_im):
        tw_host += [a, b]

    def kernel(xr_ref, *rest):
        tws = [r[:] for r in rest[:-2]]
        or_ref, oi_ref = rest[-2:]
        xr = xr_ref[:]
        yr, yi = _stockham_body(xr, jnp.zeros_like(xr), tws, n, chunk)
        or_ref[:] = yr
        oi_ref[:] = yi

    data_spec = pl.BlockSpec((n, chunk), lambda j: (_I0, j))
    tw_specs = [pl.BlockSpec(t.shape, lambda j: (_I0,)) for t in tw_host]
    call = pl.pallas_call(
        kernel,
        grid=(B // chunk,),
        in_specs=[data_spec] + tw_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((n, B), jnp.float32),
                   jax.ShapeDtypeStruct((n, B), jnp.float32)),
        interpret=interpret,
    )
    # NOTE: pass HOST numpy twiddles — converting at call time creates
    # per-trace constants; caching device arrays created under an active
    # jit trace leaks tracers on any later retrace.
    return lambda xr: call(xr, *tw_host)


@lru_cache(maxsize=None)
def _ifft_real_out_call(n, B, interpret):
    """Inverse sublane FFT keeping only the REAL part of the result (the
    production convolutions end in a real field), saving one full HBM
    write vs ``ifft_sublane``."""
    from jax.experimental import pallas as pl

    if n & (n - 1):
        raise ValueError(f"ifft_sublane_real_out needs a power-of-two axis, "
                         f"got {n}")
    chunk = _pick_chunk(B)
    tw_re, tw_im = _twiddles(n, True)
    tw_host = []
    for a, b in zip(tw_re, tw_im):
        tw_host += [a, b]
    scale = np.float32(1.0 / n)

    def kernel(xr_ref, xi_ref, *rest):
        tws = [r[:] for r in rest[:-1]]
        o_ref = rest[-1]
        yr, _ = _stockham_body(xr_ref[:], xi_ref[:], tws, n, chunk)
        o_ref[:] = yr * scale

    data_spec = pl.BlockSpec((n, chunk), lambda j: (_I0, j))
    tw_specs = [pl.BlockSpec(t.shape, lambda j: (_I0,)) for t in tw_host]
    call = pl.pallas_call(
        kernel,
        grid=(B // chunk,),
        in_specs=[data_spec, data_spec] + tw_specs,
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((n, B), jnp.float32),
        interpret=interpret,
    )
    return lambda xr, xi: call(xr, xi, *tw_host)


@lru_cache(maxsize=None)
def _sublane_conv_call(n, B, interpret):
    """Fused sublane-axis spectral CONVOLUTION: forward Stockham sweep,
    multiply by a real kernel, inverse sweep — one VMEM residency, one
    HBM read + one write of the state instead of the four a separate
    fwd / multiply / inv sequence costs.  This is the z-axis step of the
    composed 3-D pipeline: after the XLA transpose sandwich brings z to
    the sublanes, the FULL 3-D spectrum exists exactly here, so the
    kernel multiply rides in this call for free."""
    from jax.experimental import pallas as pl

    if n & (n - 1):
        raise ValueError(f"sublane_conv needs a power-of-two axis, got {n}")
    # the fused body holds fwd + inv stage temporaries; halve the chunk
    chunk = _pick_chunk(B)
    if chunk > 256 and B % 256 == 0:
        chunk = 256
    tw_f = _twiddles(n, False)
    tw_i = _twiddles(n, True)
    tw_host = []
    for a, b in zip(*tw_f):
        tw_host += [a, b]
    for a, b in zip(*tw_i):
        tw_host += [a, b]
    n_f = len(tw_f[0]) * 2
    scale = np.float32(1.0 / n)

    def kernel(xr_ref, xi_ref, k_ref, *rest):
        tws_f = [r[:] for r in rest[:n_f]]
        tws_i = [r[:] for r in rest[n_f:-2]]
        or_ref, oi_ref = rest[-2:]
        yr, yi = _stockham_body(xr_ref[:], xi_ref[:], tws_f, n, chunk)
        k = k_ref[:]
        yr = yr * k
        yi = yi * k
        yr, yi = _stockham_body(yr, yi, tws_i, n, chunk)
        or_ref[:] = yr * scale
        oi_ref[:] = yi * scale

    data_spec = pl.BlockSpec((n, chunk), lambda j: (_I0, j))
    tw_specs = [pl.BlockSpec(t.shape, lambda j: (_I0,)) for t in tw_host]
    call = pl.pallas_call(
        kernel,
        grid=(B // chunk,),
        in_specs=[data_spec, data_spec, data_spec] + tw_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((n, B), jnp.float32),
                   jax.ShapeDtypeStruct((n, B), jnp.float32)),
        interpret=interpret,
    )
    return lambda xr, xi, k: call(xr, xi, k, *tw_host)


def _stockham_body_mid(xr, xi, tws, n, c0, n2):
    """The radix-2 Stockham sweep along AXIS 1 of (c0, n, n2) f32 values
    (the y axis of a 3-D field: sublane groups, no transpose needed).
    State viewed as (c0, m groups, l transform length, n2 lanes)."""
    xr = xr.reshape(c0, n, 1, n2)
    xi = xi.reshape(c0, n, 1, n2)
    m, l, s = n, 1, 0
    while l < n:
        wr = tws[2 * s].reshape(1, 1, l, 1)
        wi = tws[2 * s + 1].reshape(1, 1, l, 1)
        tr, ti = xr[:, : m // 2], xi[:, : m // 2]
        br, bi = xr[:, m // 2:], xi[:, m // 2:]
        pr = wr * br - wi * bi
        pi_ = wr * bi + wi * br
        xr = jnp.concatenate([tr + pr, tr - pr], axis=2)
        xi = jnp.concatenate([ti + pi_, ti - pi_], axis=2)
        m //= 2
        l *= 2
        s += 1
    return xr.reshape(c0, n, n2), xi.reshape(c0, n, n2)


def _pick_c0(n0, n1, n2):
    """Largest axis-0 chunk keeping the ~16 live (c0, n1, n2) stage
    temporaries inside the VMEM scoped stack (~12 MB budget)."""
    budget = 12 * 2**20
    for c in (8, 4, 2, 1):
        if n0 % c == 0 and c * n1 * n2 * 4 * 16 <= budget:
            return c
    return 1


@lru_cache(maxsize=None)
def _fft_mid_call(n0, n1, n2, inverse, interpret):
    """FFT along axis 1 of an (n0, n1, n2) f32 (re, im) pair: rank-3
    blocks gridded over axis-0 chunks — the middle (sublane-group) axis
    slices as cleanly as the sublane axis, so no transpose is needed."""
    from jax.experimental import pallas as pl

    if n1 & (n1 - 1):
        raise ValueError(f"fft_mid needs a power-of-two axis 1, got {n1}")
    c0 = _pick_c0(n0, n1, n2)
    tw_re, tw_im = _twiddles(n1, inverse)
    tw_host = []
    for a, b in zip(tw_re, tw_im):
        tw_host += [a, b]
    scale = np.float32(1.0 / n1) if inverse else None

    def kernel(xr_ref, xi_ref, *rest):
        tws = [r[:] for r in rest[:-2]]
        or_ref, oi_ref = rest[-2:]
        yr, yi = _stockham_body_mid(xr_ref[:], xi_ref[:], tws, n1, c0, n2)
        if scale is not None:
            yr = yr * scale
            yi = yi * scale
        or_ref[:] = yr
        oi_ref[:] = yi

    data_spec = pl.BlockSpec((c0, n1, n2), lambda i: (i, _I0, _I0))
    tw_specs = [pl.BlockSpec(t.shape, lambda i: (_I0,)) for t in tw_host]
    call = pl.pallas_call(
        kernel,
        grid=(n0 // c0,),
        in_specs=[data_spec, data_spec] + tw_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((n0, n1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((n0, n1, n2), jnp.float32)),
        interpret=interpret,
    )
    return lambda xr, xi: call(xr, xi, *tw_host)


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


def fft_sublane_real(xr, interpret=False):
    """Forward DFT along axis 0 of a REAL (n, B) f32 batch; matches
    ``jnp.fft.fft(xr, axis=0)`` (full spectrum, imag input synthesized
    as zeros in VMEM)."""
    n, B = xr.shape
    return _fft_real_call(int(n), int(B), interpret)(xr)


def ifft_sublane_real_out(xr, xi, interpret=False):
    """Inverse DFT along axis 0 returning ONLY the real part; matches
    ``jnp.fft.ifft(xr + 1j xi, axis=0).real``."""
    n, B = xr.shape
    return _ifft_real_out_call(int(n), int(B), interpret)(xr, xi)


def sublane_conv(xr, xi, k, interpret=False):
    """Fused spectral convolution along axis 0: ``ifft(k * fft(x))`` with
    a REAL (n, B) kernel ``k``, one VMEM residency."""
    n, B = xr.shape
    return _sublane_conv_call(int(n), int(B), interpret)(xr, xi, k)


def fft_mid(xr, xi, interpret=False):
    """Forward DFT along axis 1 of an (n0, n1, n2) f32 (re, im) pair;
    matches ``jnp.fft.fft(xr + 1j xi, axis=1)``.  No transpose: rank-3
    blocks gridded over axis-0 chunks."""
    n0, n1, n2 = xr.shape
    return _fft_mid_call(int(n0), int(n1), int(n2), False, interpret)(xr, xi)


def ifft_mid(xr, xi, interpret=False):
    """Inverse (1/n1-normalized) DFT along axis 1; matches
    ``jnp.fft.ifft(xr + 1j xi, axis=1)``."""
    n0, n1, n2 = xr.shape
    return _fft_mid_call(int(n0), int(n1), int(n2), True, interpret)(xr, xi)


def conv3_bfly(x, k_t, interpret=False):
    """Composed 3-D spectral convolution ``ifftn(K * fftn(x)).real`` for a
    REAL f32 cube ``x`` and a REAL full-spectrum kernel given in
    TRANSPOSED (z, y, x) layout ``k_t`` (precompute once per kernel:
    ``k_t = jnp.transpose(K_full, (2, 1, 0))``).

    The round-5 go/no-go composition (VERDICT r04 next-#1):

    1. forward x — sublane Stockham on the real cube (imag synthesized),
    2. forward y — middle-axis rank-3 Stockham (no transpose),
    3. XLA transpose sandwich brings z to the sublanes,
    4. fused z-step: forward sweep + kernel multiply + inverse sweep in
       ONE VMEM residency (the full 3-D spectrum exists exactly there),
    5. transpose back, inverse y, inverse x keeping only the real part.

    Measured vs the backend ``irfftn(K * rfftn(x))`` pair inside chained
    non-identical-input programs — see docs/design.md round-5 go/no-go.
    """
    n0, n1, n2 = x.shape
    xr, xi = fft_sublane_real(x.reshape(n0, n1 * n2), interpret)
    xr = xr.reshape(n0, n1, n2)
    xi = xi.reshape(n0, n1, n2)
    xr, xi = fft_mid(xr, xi, interpret)
    xr = jnp.transpose(xr, (2, 1, 0))
    xi = jnp.transpose(xi, (2, 1, 0))
    xr, xi = sublane_conv(xr.reshape(n2, n1 * n0), xi.reshape(n2, n1 * n0),
                          k_t.reshape(n2, n1 * n0), interpret)
    xr = jnp.transpose(xr.reshape(n2, n1, n0), (2, 1, 0))
    xi = jnp.transpose(xi.reshape(n2, n1, n0), (2, 1, 0))
    xr, xi = ifft_mid(xr, xi, interpret)
    y = ifft_sublane_real_out(xr.reshape(n0, n1 * n2),
                              xi.reshape(n0, n1 * n2), interpret)
    return y.reshape(n0, n1, n2)
