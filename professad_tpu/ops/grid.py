"""Reciprocal-space grid math: wavevectors, FFT derivatives, density descriptors.

TPU-native rebuild of the reference L1 layer
(/root/reference/src/professad/functional_tools.py:135-287).

Design notes (TPU/XLA-first):

* ``wavevecs`` is a pure, traced function of ``box_vecs`` so stresses flow
  through the k-vectors by autodiff (the integer frequency index tables are
  host-side numpy constants baked into the jaxpr; only the reciprocal-lattice
  matrix ``b`` is traced).  Under ``jit`` every duplicate ``wavevecs`` call
  across energy terms is removed by XLA CSE, so — unlike the reference, which
  pays a Python re-build per closure evaluation — recomputation is free.
* All masked/singular expressions use the double-``where`` idiom so that
  gradients are NaN-free (JAX cannot trace boolean indexing; reference used
  ``k2[k2 != 0]`` style masking, e.g. functional_tools.py:247-248).
* Everything is dtype-polymorphic: float64 for the correctness tier (CPU) and
  float32 for the TPU fast path (TPU FFT has no f64 kernel).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "wavevecs", "wavenumbers", "grad_i", "grad_dot_grad", "laplacian",
    "reduced_gradient", "reduced_gradient_squared", "reduced_laplacian",
    "safe_sqrt", "volume", "rfft_shape", "inv3x3", "imul", "expi", "powr",
    "log_hp", "exp_hp", "rfftn", "irfftn", "set_fft_mode", "get_fft_mode",
    "Spectrum", "spectral_resample",
]


def inv3x3(m):
    """Analytic 3x3 matrix inverse via the adjugate.

    TPU note: XLA:TPU's LuDecomposition supports only f32, so
    ``jnp.linalg.inv`` breaks the f64 path on device; the closed form is
    dtype-polymorphic, cheaper, and cleanly differentiable.

    Eager (concrete) calls raise on a singular or near-singular matrix —
    the reference asserts cell invertibility (functional_tools.py:150); a
    degenerate cell mid-geometry-optimization must be a diagnosable error,
    not silent inf/NaN.  Traced calls (inside jit/grad) skip the check;
    the host-side geometry loops validate the concrete cell each step.
    """
    if not isinstance(m, jax.core.Tracer):
        mc = np.asarray(m, dtype=np.float64)
        det_c = np.linalg.det(mc)
        # Hadamard bound: |det| <= prod of row norms; small ratio = singular
        scale = float(np.prod(np.sqrt(np.sum(mc * mc, axis=1))))
        if not np.isfinite(det_c) or abs(det_c) <= 1e-12 * max(scale, 1e-300):
            raise ValueError(
                f"inv3x3: singular or near-singular matrix (det={det_c:.3e}, "
                f"row-norm scale={scale:.3e}); degenerate cell?")
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack([jnp.stack([A, B, C]),
                     jnp.stack([D, E, F]),
                     jnp.stack([G, H, I])])
    return adj / det


def rfft_shape(shape):
    """Shape of the half-spectrum rfftn output for a real grid of ``shape``."""
    return (*shape[:-1], shape[-1] // 2 + 1)


def volume(box_vecs):
    """Cell volume |det h| (rows of ``box_vecs`` are lattice vectors)."""
    return jnp.abs(jnp.linalg.det(box_vecs))


def _freq_indices(shape):
    """Integer FFT frequency index tables matching rfftn layout.

    The Nyquist index of the two full axes is sign-flipped to +n/2 for even
    lengths so that stress autodiff is consistent (parity:
    functional_tools.py:152-155).  Host-side numpy: static per grid shape.
    """
    n0, n1, n2 = shape
    j0 = np.fft.fftfreq(n0) * n0
    j1 = np.fft.fftfreq(n1) * n1
    j0[n0 // 2] = abs(j0[n0 // 2])
    j1[n1 // 2] = abs(j1[n1 // 2])
    j2 = np.fft.rfftfreq(n2) * n2
    return (
        j0.reshape(-1, 1, 1),
        j1.reshape(1, -1, 1),
        j2.reshape(1, 1, -1),
    )


def wavevecs(box_vecs, shape):
    """Wavevectors kx, ky, kz, k2 consistent with ``rfftn`` layout.

    Differentiable w.r.t. ``box_vecs`` — this is how stress flows through
    every FFT-based term (parity: functional_tools.py:135-162).
    """
    if _PENCIL_AXIS is not None:
        # callers pass the LOCAL (axis-0 slab) field shape; the k-slab is
        # the axis-1 pencil of the GLOBAL grid's half spectrum
        from ..parallel import pfft
        n_dev = jax.lax.axis_size(_PENCIL_AXIS)
        gshape = (shape[0] * n_dev, shape[1], shape[2])
        return pfft.pwavevecs(box_vecs, gshape, _PENCIL_AXIS)
    dtype = box_vecs.dtype
    b = 2.0 * jnp.pi * inv3x3(box_vecs.T)  # reciprocal lattice rows
    nA, nB, nC = _freq_indices(shape)
    nA = jnp.asarray(nA, dtype)
    nB = jnp.asarray(nB, dtype)
    nC = jnp.asarray(nC, dtype)
    kx = nA * b[0, 0] + nB * b[1, 0] + nC * b[2, 0]
    ky = nA * b[0, 1] + nB * b[1, 1] + nC * b[2, 1]
    kz = nA * b[0, 2] + nB * b[1, 2] + nC * b[2, 2]
    k2 = kx * kx + ky * ky + kz * kz
    return kx, ky, kz, k2


def imul(k, ft):
    """(i k) * ft for real k and complex ft, in real arithmetic.

    Avoids Python ``1j`` literals, which materialize complex128 constants
    under x64 — TPU supports C64 only.  Also cheaper than a general complex
    multiply (2 real multiplies instead of 4).  Handles the ``Spectrum``
    pair representation of the on-TPU f64 tier transparently.
    """
    if isinstance(ft, Spectrum):
        return Spectrum(-k * ft.im, k * ft.re)
    return jax.lax.complex(-k * jnp.imag(ft), k * jnp.real(ft))


def expi(theta):
    """e^{i theta} for real theta, as lax.complex(cos, sin) (C64-safe, see
    ``imul``)."""
    return jax.lax.complex(jnp.cos(theta), jnp.sin(theta))


@jax.custom_jvp
def _qmean32(x):
    n = x.size
    cols = 512
    pad = (-n) % cols
    xf = x.reshape(-1)
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), x.dtype)])
    partial = jnp.sum(xf.reshape(-1, cols), axis=0)
    return jnp.sum(partial.astype(jnp.float64)) / n


@_qmean32.defjvp
def _qmean32_jvp(primals, tangents):
    # Linear (and transposable) tangent rule: a plain f32 mean cast to f64.
    # Reverse mode transposes it to full(ct/n) in f32 — gradients never leave
    # f32 — and, being custom_jvp (not custom_vjp), arbitrary-order autodiff
    # composes: the f32 tier supports jvp-of-grad (HVPs, preconditioner
    # kernels, second derivatives), which custom_vjp forbids beyond order 1.
    x, = primals
    t, = tangents
    return _qmean32(x), jnp.mean(t).astype(jnp.float64)


def qmean(x):
    """Quadrature mean for energy terms: f64-accurate value, f32 backward.

    Every energy term is ``mean(integrand) * vol``; in f32 a plain mean has
    a ~6e-8 relative noise floor, making the reference's dE < 1e-7 eV
    convergence criterion undetectable on TPU (no native f64).  For f32
    inputs this column-sums in f32 (512 partials) and combines in emulated
    f64 — measured 0.085 ms at 128^3 (same cost as a plain f32 mean, 10x
    cheaper than a full f64 mean) with ~7e-10 relative error — and returns
    an **f64 scalar** so energies and dE stay resolvable; the custom VJP
    casts the cotangent back to f32 so gradients never leave f32.

    ONLY use this for terminal scalars (energies); means that feed array
    arithmetic (n0, N_tilde) must stay in the working dtype or they would
    upcast the whole graph.  f64 inputs take a plain ``jnp.mean`` —
    bit-identical correctness tier.  Both branches support arbitrary-order
    autodiff (the f32 branch is custom_jvp with a linear tangent rule), so
    HVPs and second derivatives work on the TPU f32 tier too.
    """
    if _PENCIL_AXIS is not None:
        from ..parallel import pfft
        return pfft.pqmean(x, _PENCIL_AXIS)
    if x.dtype != jnp.float32:
        return jnp.mean(x)
    return _qmean32(x)


@jax.custom_jvp
def _wmean32(x):
    n = x.size
    cols = 512
    pad = (-n) % cols
    xf = x.reshape(-1)
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), x.dtype)])
    partial = jnp.sum(xf.reshape(-1, cols), axis=0)
    return (jnp.sum(partial.astype(jnp.float64)) / n).astype(jnp.float32)


@_wmean32.defjvp
def _wmean32_jvp(primals, tangents):
    # linear + transposable: a plain f32 mean (same rule as _qmean32)
    x, = primals
    t, = tangents
    return _wmean32(x), jnp.mean(t)


def wmean(x):
    """Working-dtype accurate mean for means that FEED array arithmetic
    (N_tilde normalization, chemical potential mu) rather than terminal
    energies (those take :func:`qmean`, which returns f64).

    In f32 the plain reduction's error is summation-ORDER dependent: XLA
    compiles ``mean(reshape(flat))`` and ``mean(native-3D)`` to different
    reduction strategies, measured at +6e-8 vs -4e-7 relative on the same
    48^3 density-like field (XLA:CPU; the 3-D strategy row-sums one axis
    naively).  A 3e-6-relative N_tilde error rescales the whole density
    and shifts the total energy by mu*N*rho ~ 1e-5 Ha — dominating every
    other f32 error source.  This computes the same column-sum +
    f64-combine as ``qmean`` (~1-ulp) but casts back to f32 so the graph
    never upcasts.  f64 inputs take a plain mean (bit-identical
    correctness tier); the tangent rule is linear, so HVPs and
    second-order autodiff compose.
    """
    if _PENCIL_AXIS is not None:
        from ..parallel import pfft
        return pfft.pwmean(x, _PENCIL_AXIS)
    if x.dtype != jnp.float32:
        return jnp.mean(x)
    return _wmean32(x)


def safe_sqrt(x):
    """NaN-free-gradient sqrt: 0 where x <= 0 (double-where idiom)."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _cbrt_newton(x):
    """Accurate f32 cube root for non-negative x: fast-path seed + one Newton
    step.  TPU's pow/cbrt go through approximate exp/log (~1e-6 relative,
    biased); one Newton iteration y <- (2y + x/y^2)/3 restores ~1-ulp
    accuracy using only correctly-rounded multiply/divide.  The step is
    zero-safe: at x=0 the raw update is 0/0, so the denominator is guarded
    and the result pinned to cbrt(0)=0 — matching ``x ** (1/3)``."""
    pos = x > 0
    xs = jnp.where(pos, x, 1.0)  # guard the input too: NaN-free gradients
    y = jnp.cbrt(xs)
    return jnp.where(pos, (2.0 * y + xs / (y * y)) / 3.0, 0.0)


_LN2_HI = np.float32(0.6931457519531250)   # high bits of ln 2, exact in f32
_LN2_LO = np.float32(1.4286067653e-06)     # ln 2 - _LN2_HI


@jax.custom_jvp
def _log32(x):
    m, e = jnp.frexp(x)                     # x = m 2^e, m in [0.5, 1)
    small = m < np.float32(np.sqrt(0.5))
    m = jnp.where(small, 2.0 * m, m)
    e = jnp.where(small, e - 1, e).astype(x.dtype)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    atanh2 = 2.0 * t * (1.0 + t2 * (1.0 / 3.0 + t2 * (
        1.0 / 5.0 + t2 * (1.0 / 7.0 + t2 * (1.0 / 9.0)))))
    return e * _LN2_HI + (e * _LN2_LO + atanh2)


@_log32.defjvp
def _log32_jvp(primals, tangents):
    # frexp is not differentiable; the analytic derivative 1/x is a single
    # correctly-rounded divide — more accurate than any chain rule
    x, = primals
    t, = tangents
    return _log32(x), t / x


@jax.custom_jvp
def _exp32(x):
    # range reduction: x = n ln2 + r with |r| <= ln2/2, n exact in f32
    n = jnp.round(x * np.float32(1.4426950408889634))  # 1/ln2
    r = (x - n * _LN2_HI) - n * _LN2_LO
    # degree-7 Taylor on |r| <= 0.3466: truncation ~ r^8/8! < 5e-9
    p = 1.0 / 5040.0
    for c in (1.0 / 720.0, 1.0 / 120.0, 1.0 / 24.0, 1.0 / 6.0, 0.5, 1.0, 1.0):
        p = p * r + c
    return jnp.ldexp(p, n.astype(jnp.int32))


@_exp32.defjvp
def _exp32_jvp(primals, tangents):
    # ldexp is not differentiable; the analytic derivative is exp itself
    x, = primals
    t, = tangents
    y = _exp32(x)
    return y, t * y


def exp_hp(x):
    """Accurate f32 exponential.

    TPU's ``exp`` shares the approximate-transcendental unit with ``pow`` /
    ``log`` (~1e-6 biased relative error).  This version reduces by the
    two-constant ln 2 split (n exact, |r| <= ln2/2) and evaluates e^r with a
    degree-7 Horner polynomial — only correctly-rounded add/mul plus an
    exact ``ldexp`` scale, ~1-2 ulp total.  The derivative is the function
    itself via custom_jvp.  f64 falls through to ``jnp.exp``.
    """
    if x.dtype != jnp.float32:
        return jnp.exp(x)
    return _exp32(x)


def log_hp(x):
    """Accurate f32 natural log for positive x.

    TPU's ``log`` (like its ``pow``) is a fast approximation with ~1e-6
    biased relative error — measured at -90 ueV/atom on the fcc-Al 128^3
    PBE energy through the correlation logarithms, and -29 on WT through
    the Lindhard-kernel log.  This version reduces to m in [sqrt(1/2),
    sqrt(2)) via ``frexp`` (exact) and evaluates log(m) = 2 atanh(t),
    t = (m-1)/(m+1) <= 0.1716, with a 5-term odd series (truncation
    ~5e-10) — everything in correctly-rounded add/mul/divide, plus a
    two-constant ln 2 split for the exponent part; the derivative is the
    exact 1/x via custom_jvp.  f64 falls through to ``jnp.log``
    (reference-tier bit parity).
    """
    if x.dtype != jnp.float32:
        return jnp.log(x)
    return _log32(x)


def powr(x, p):
    """Accurate x**p for positive x and small rational exponents, f32-safe.

    On TPU, ``x ** p`` lowers to approximate exp(p log x): ~1e-6 relative
    error with systematic bias.  Measured on the fcc-Al 128^3 energy, that
    costs -17 (TF) / -47 (WT) / -88 (PBE) ueV/atom versus +3 on CPU f32
    (docs/design.md), and the matching gradient error is what makes f32
    density optimization crawl (~550 iterations to the noise floor on TPU
    vs ~45 on CPU).  The OFDFT integrands only ever need exponents with
    denominator 1, 2, 3 or 6, so we build them from integer powers (exact),
    sqrt (correctly rounded on the VPU), and a Newton-refined cube root.

    Exponents that aren't small multiples of 1/6 (concrete but irrational
    or arbitrary, e.g. WGC98's (5 +- sqrt 5)/6 or the HC family's beta) take
    the compensated route exp_hp(p * log_hp(x)) — still built only from
    correctly-rounded primitives (~3e-7 unbiased vs ~1e-6 biased for the
    TPU ``pow``), zero-guarded so powr(0, p>0) == 0.  Only TRACED exponents
    (differentiating w.r.t. a trainable p) fall back to ``**``, as does the
    f64 tier (bit-parity with the reference).  powr(0, p) == 0 for p > 0,
    matching ``**`` (the cube-root Newton step is zero-safe); negative
    exponents at x=0 produce inf, exactly as ``**`` does — call sites floor
    the density for those, as they must for ``**``.
    """
    if x.dtype != jnp.float32:
        return x ** p
    if isinstance(p, jnp.ndarray):
        if isinstance(p, jax.core.Tracer) or p.ndim != 0:
            return x ** p
        p = float(p)  # concrete 0-d parameter (e.g. HC beta): use fast path
    num = root = None
    for r in (1, 2, 3, 6):
        n = p * r
        if abs(n - round(n)) < 1e-9 and 0 < abs(round(n)) <= 30:
            num, root = int(round(n)), r
            break
    if num is None:
        if p == 0:
            return jnp.ones_like(x)  # x**0 == 1 everywhere, incl. x=0
        # general concrete exponent: compensated exp(p log x), zero-guarded
        pos = x > 0
        xs = jnp.where(pos, x, 1.0)
        out = exp_hp(jnp.asarray(p, x.dtype) * log_hp(xs))
        zero_val = np.float32(0.0) if p > 0 else np.float32(np.inf)
        return jnp.where(pos, out, zero_val)
    inv = num < 0
    num = -num if inv else num
    if root == 1:
        base = x
    elif root == 2:
        base = jnp.sqrt(x)
    elif root == 3:
        base = _cbrt_newton(x)
    else:  # root == 6
        base = jnp.sqrt(_cbrt_newton(x))
    # integer power by squaring: O(log n) multiplies keeps rounding at a
    # few ulp even for the larger exponents
    out = None
    sq = base
    n = num
    while n:
        if n & 1:
            out = sq if out is None else out * sq
        n >>= 1
        if n:
            sq = sq * sq
    return 1.0 / out if inv else out


def wavenumbers(box_vecs, shape):
    """|k| on the half-spectrum grid, zero-safe at the origin."""
    _, _, _, k2 = wavevecs(box_vecs, shape)
    return safe_sqrt(k2)


# ------------------------------ FFT dispatch --------------------------------
#
# All 3-D transforms in the package route through rfftn/irfftn below.  Mode
# "native" is jnp.fft (XLA backend FFT).  Mode "matmul" uses ops.tpufft's
# full-precision MXU matmul DFT — measured on TPU v5e at 128^3: 0.77 vs
# 0.875 ms/transform and 3.2e-7 vs 7.5e-7 relative error, i.e. both faster
# and more accurate than the backend FFT.  Mode "pair" is the on-TPU
# HIGH-PRECISION tier: the matmul DFT carried as an explicit (re, im) pair
# of REAL arrays (``Spectrum``) — XLA:TPU emulates f64 for real arithmetic
# (measured 2e-14 matmul, 2e-13 exp/log on v5e) but supports no complex128
# type and no f64 FFT kernel, so the complex container is what blocks the
# f64 correctness tier from the device, not the arithmetic.  The mode is
# read at TRACE time: set it before building jitted closures (bench.py sets
# it for TPU runs).

_FFT_MODE = "native"


class Spectrum:
    """A half-spectrum carried as explicit (re, im) real arrays.

    Supports exactly the arithmetic the energy terms use on spectra —
    multiplication by real kernels, complex multiply, add/sub/neg, .real /
    .imag — as plain real ops, so the f64 tier traces on TPU (no complex128
    there).  Registered as a pytree: jit/grad/vmap treat it transparently.
    """

    __slots__ = ("re", "im")
    __array_priority__ = 100  # our __rmul__ wins over ndarray __mul__

    def __init__(self, re, im):
        self.re = re
        self.im = im

    @property
    def real(self):
        return self.re

    @property
    def imag(self):
        return self.im

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    def __mul__(self, o):
        if isinstance(o, Spectrum):
            return Spectrum(self.re * o.re - self.im * o.im,
                            self.re * o.im + self.im * o.re)
        return Spectrum(self.re * o, self.im * o)

    __rmul__ = __mul__

    def __add__(self, o):
        if isinstance(o, Spectrum):
            return Spectrum(self.re + o.re, self.im + o.im)
        return Spectrum(self.re + o, self.im)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Spectrum):
            return Spectrum(self.re - o.re, self.im - o.im)
        return Spectrum(self.re - o, self.im)

    def __rsub__(self, o):
        return Spectrum(o - self.re, -self.im)

    def __neg__(self):
        return Spectrum(-self.re, -self.im)

    def __truediv__(self, o):
        if isinstance(o, Spectrum):
            raise TypeError("Spectrum / Spectrum not supported")
        return Spectrum(self.re / o, self.im / o)

    def __getitem__(self, idx):
        return Spectrum(self.re[idx], self.im[idx])

    def conj(self):
        return Spectrum(self.re, -self.im)


jax.tree_util.register_pytree_node(
    Spectrum,
    lambda s: ((s.re, s.im), None),
    lambda _, ch: Spectrum(*ch),
)


def set_fft_mode(mode):
    """Select the 3-D FFT implementation: "native" (jnp.fft), "matmul"
    (ops.tpufft MXU DFT; complex output) or "pair" (matmul DFT as a real
    (re, im) ``Spectrum`` — the on-TPU f64 high-precision tier).  Affects
    subsequently traced functions only."""
    global _FFT_MODE
    if mode not in ("native", "matmul", "pair"):
        raise ValueError('fft mode must be "native", "matmul" or "pair"')
    _FFT_MODE = mode


def get_fft_mode():
    return _FFT_MODE


_PENCIL_AXIS = None


class pencil_mode:
    """Trace-time context that redirects the core spectral primitives to
    their pencil-decomposed SPMD implementations (``parallel.pfft``).

    Inside a ``shard_map`` body traced under ``with pencil_mode(axis):``,
    the SERIAL term bodies in ``models/`` evaluate distributed — every
    ``rfftn``/``irfftn`` becomes a pencil transform (one ``all_to_all``),
    ``wavevecs`` yields this device's k-slab, and ``qmean``/``wmean``
    psum globally — so any fixed-kernel functional gains a multi-chip
    implementation with AUTOMATIC parity to its serial form (same body,
    same floating-point recipe; e.g. the Weizsaecker Laplacian-vs-gradient
    form question cannot re-arise).  Fields are axis-0-sharded slabs of
    the global grid; callers pass LOCAL shapes exactly as the serial code
    passes full shapes.

    Ladder-based terms (the Huang-Carter family's batched 4-D transform,
    spline YukawaGGA, MGP) also distribute: the field-dependent
    convolution's trailing ladder axis rides one batched all_to_all
    (ops/fieldconv.py pencil branch; tests/test_parallel_generic.py).
    The context is trace-time state, not runtime state — enter it inside
    the shard_map body.
    """

    def __init__(self, axis_name="grid"):
        self.axis_name = axis_name

    def __enter__(self):
        global _PENCIL_AXIS
        self._prev = _PENCIL_AXIS
        _PENCIL_AXIS = self.axis_name
        return self

    def __exit__(self, *exc):
        global _PENCIL_AXIS
        _PENCIL_AXIS = self._prev
        return False


_CONV_MODE = "native"


def set_conv_mode(mode):
    """Select the implementation of dedicated spectral convolutions
    (``spectral_convolution``): "native" composes rfftn/irfftn; "pallas"
    uses the fused 3-kernel MXU implementation (ops/pallas_fft) for f32
    3-D fields — TPU fast tier only.  Trace-time switch."""
    global _CONV_MODE
    if mode not in ("native", "pallas"):
        raise ValueError('conv mode must be "native" or "pallas"')
    _CONV_MODE = mode


def spectral_convolution(kern, field, shape):
    """irfftn(kern * rfftn(field)) for a REAL half-spectrum kernel — the
    package's dedicated-convolution primitive (WT/MGP kernels, Laplacians,
    preconditioner applications).  Sites whose forward transform is shared
    with other consumers should keep composing rfftn/irfftn instead."""
    if (_CONV_MODE == "pallas" and field.ndim == 3
            and field.dtype == jnp.float32 and _PENCIL_AXIS is None):
        from .pallas_fft import spectral_conv
        return spectral_conv(field, kern)
    return irfftn(kern * rfftn(field), shape)


def rfftn(x):
    """3-D real FFT through the selected implementation (see set_fft_mode).

    f32 3-D transforms are DC-SPLIT: the mean is subtracted before the
    backend transform and the k=0 coefficient is set from it exactly.
    Measured necessity (TPU v5e): the backend f32 FFT leaks ~6e-8 of the
    DC amplitude into the lowest +/-1 modes (f32 ulp of the DC-dominated
    stage partials).  A plane-wave density is ~97% DC, so at 256^3 the
    leak injects ~1.4e-2 (unnormalized) into k_min modes of every
    transform; amplified by the 4pi/k^2 Hartree kernel this becomes a
    systematic low-k bias in the fused analytic potential large enough
    that density optimization stalls 1.6 mHa (43 meV) above the true
    minimum — and the leak pattern varies between compiled programs,
    making results run-to-run nondeterministic.  Transforming the
    fluctuation field scales the leak by the fluctuation/DC ratio
    (~30-100x smaller); the exactly-uniform fields used by the
    preconditioner HVP become exact.  f64-class modes (CPU tier, pair
    tier) resolve the leak natively and skip the split."""
    if _PENCIL_AXIS is not None:
        if x.ndim != 3:
            raise NotImplementedError(
                "pencil mode transforms 3-D fields only — ladder-based "
                "terms (field_dependent_convolution's batched 4-D FFT) "
                "have no distributed implementation")
        from ..parallel import pfft
        return pfft.prfftn_dc(x, _PENCIL_AXIS)
    if _FFT_MODE == "matmul" and x.ndim == 3:
        from . import tpufft
        return tpufft.rfftn_hp(x)
    if _FFT_MODE == "pair" and x.ndim == 3:
        from . import tpufft
        return Spectrum(*tpufft.rfftn_pair(x))
    if x.dtype == jnp.float32 and x.ndim == 3:
        xm = jnp.mean(x)
        h = jnp.fft.rfftn(x - xm)
        return h.at[0, 0, 0].add(xm * x.size)
    return jnp.fft.rfftn(x)


def irfftn(X, shape):
    """Inverse of :func:`rfftn` (1/N-normalized, real output).  f32 3-D
    spectra are DC-split like :func:`rfftn` (the k=0 coefficient is
    carried around the backend transform as an exact uniform shift)."""
    if _PENCIL_AXIS is not None:
        if X.ndim != 3:
            raise NotImplementedError(
                "pencil mode transforms 3-D fields only — ladder-based "
                "terms have no distributed implementation")
        from ..parallel import pfft
        return pfft.pirfftn_dc(X, shape, _PENCIL_AXIS)
    if isinstance(X, Spectrum):
        from . import tpufft
        return tpufft.irfftn_pair(X.re, X.im, shape)
    if _FFT_MODE == "matmul" and X.ndim == 3:
        from . import tpufft
        return tpufft.irfftn_hp(X, shape)
    if X.dtype == jnp.complex64 and X.ndim == 3:
        dc = X[0, 0, 0].real
        y = jnp.fft.irfftn(X.at[0, 0, 0].set(0.0), shape)
        n_tot = shape[0] * shape[1] * shape[2]
        return y + dc / n_tot
    return jnp.fft.irfftn(X, shape)


def spectral_resample(field, new_shape):
    """Band-limited (Fourier) resampling of a periodic real field onto a
    different grid over the SAME cell — the multigrid warm-start primitive
    (converge on a coarse grid, refine spectrally, finish on the fine
    grid; no reference analogue — the reference is single-grid).

    Exact for fields band-limited below both grids' Nyquist shells: every
    plane-wave component common to both grids is transferred with its
    coefficient unchanged (tests/test_system_utils.py).  Self-conjugate
    Nyquist modes of even axes cannot be split correctly between the +/-
    frequencies of a finer grid, so the source's Nyquist planes are
    dropped on every axis whose size changes — band-limiting, the standard
    convention.  Works both up (zero-padding) and down (truncation);
    output integrates to the same mean (DC is copied exactly).
    """
    old_shape = tuple(field.shape)
    new_shape = tuple(int(n) for n in new_shape)
    if len(old_shape) != 3 or len(new_shape) != 3:
        raise ValueError("spectral_resample expects 3-D fields")
    if old_shape == new_shape:
        return field
    F = rfftn(field)
    m_old = old_shape[2] // 2 + 1
    m_new = new_shape[2] // 2 + 1
    G = jnp.zeros((new_shape[0], new_shape[1], m_new), dtype=F.dtype)

    def blocks(n_old, n_new):
        """(positive slice, old negative slice, new negative slice)
        transferring every sub-Nyquist frequency; an unchanged axis
        transfers everything (identity, Nyquist included)."""
        if n_old == n_new:
            return slice(0, n_old), None, None
        m = min(n_old, n_new)
        h = (m - 1) // 2  # highest transferred |frequency| (Nyquist dropped)
        pos = slice(0, h + 1)
        neg_old = slice(n_old - h, n_old) if h else None
        neg_new = slice(n_new - h, n_new) if h else None
        return pos, neg_old, neg_new

    pos0, nold0, nnew0 = blocks(old_shape[0], new_shape[0])
    pos1, nold1, nnew1 = blocks(old_shape[1], new_shape[1])
    # last (halved) axis: columns 0..h2 (its Nyquist column dropped when
    # the axis size changes and the smaller axis is even)
    if old_shape[2] == new_shape[2]:
        pos2 = slice(0, m_old)
    else:
        m2 = min(old_shape[2], new_shape[2])
        h2 = (m2 - 1) // 2
        pos2 = slice(0, h2 + 1)

    row_pairs = [(pos0, pos0)]
    if nold0 is not None:
        row_pairs.append((nold0, nnew0))
    col_pairs = [(pos1, pos1)]
    if nold1 is not None:
        col_pairs.append((nold1, nnew1))
    for r_old, r_new in row_pairs:
        for c_old, c_new in col_pairs:
            G = G.at[r_new, c_new, pos2].set(F[r_old, c_old, pos2])
    scale = (new_shape[0] * new_shape[1] * new_shape[2]) \
        / (old_shape[0] * old_shape[1] * old_shape[2])
    return irfftn(G * jnp.asarray(scale, field.dtype), new_shape)


# ----------------------------- FFT derivatives -----------------------------

def grad_i(ki, f):
    """Spectral partial derivative df/dr_i (parity: functional_tools.py:166-183)."""
    return irfftn(imul(ki, rfftn(f)), f.shape)


def grad_dot_grad(kx, ky, kz, f):
    """|grad f|^2 via three spectral derivatives (functional_tools.py:186-206)."""
    f_ft = rfftn(f)
    gx = irfftn(imul(kx, f_ft), f.shape)
    gy = irfftn(imul(ky, f_ft), f.shape)
    gz = irfftn(imul(kz, f_ft), f.shape)
    return gx * gx + gy * gy + gz * gz


def laplacian(k2, f):
    """Spectral Laplacian (parity: functional_tools.py:209-227)."""
    return irfftn(-k2 * rfftn(f), f.shape)


# ---------------------------- density descriptors ---------------------------

def reduced_gradient(kx, ky, kz, den):
    """s = |grad n| / (2 (3 pi^2)^{1/3} n^{4/3}) (functional_tools.py:230-249)."""
    gdg = grad_dot_grad(kx, ky, kz, den)
    abs_grad = safe_sqrt(gdg)
    return 0.5 * (3.0 * np.pi**2) ** (-1.0 / 3.0) * abs_grad * powr(den, -4.0 / 3.0)


def reduced_gradient_squared(kx, ky, kz, den):
    """s^2 = |grad n|^2 / (4 (3 pi^2)^{2/3} n^{8/3}) (functional_tools.py:252-268)."""
    return (0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0)
            * grad_dot_grad(kx, ky, kz, den) * powr(den, -8.0 / 3.0))


def reduced_laplacian(k2, den):
    """q = lap n / (4 (3 pi^2)^{2/3} n^{5/3}) (functional_tools.py:271-287)."""
    return (0.25 * (3.0 * np.pi**2) ** (-2.0 / 3.0)
            * laplacian(k2, den) * powr(den, -5.0 / 3.0))
