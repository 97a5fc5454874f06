"""Pallas fused spectral convolution vs the backend FFT path.

Correctness runs in interpreter mode on CPU (the kernels are also verified
compiled on a real v5e: forward+grad within ~4e-6 relative after 30 chained
convolutions, see docs/design.md).  Uses f32 — the kernels target the TPU
fast tier.
"""

import numpy as np
import jax
import jax.numpy as jnp

from professad_tpu.ops.pallas_fft import spectral_conv


def _case(shape, seed=0):
    rng = np.random.default_rng(seed)
    m2 = shape[2] // 2 + 1
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    K = jnp.asarray(rng.random((shape[0], shape[1], m2)), jnp.float32)
    return x, K


def test_spectral_conv_matches_backend():
    for shape in ((16, 16, 16), (8, 16, 12), (16, 8, 10)):
        x, K = _case(shape)
        ref = jnp.fft.irfftn(K * jnp.fft.rfftn(x), shape)
        out = spectral_conv(x, K, True)
        rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 5e-6, (shape, rel)


def test_spectral_conv_custom_vjp_matches_backend():
    """The self-adjoint backward (same kernel on the cotangent) equals
    differentiating through the backend convolution."""
    shape = (16, 16, 16)
    x, K = _case(shape, seed=1)

    g1 = jax.grad(lambda x: jnp.sum(jnp.sin(spectral_conv(x, K, True))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(
        jnp.fft.irfftn(K * jnp.fft.rfftn(x), shape))))(x)
    rel = float(jnp.max(jnp.abs(g1 - g2)) / jnp.max(jnp.abs(g2)))
    assert rel < 5e-6, rel


def test_vpufft_stockham_matches_jnp_fft():
    """The VPU-butterfly building block (ops/vpufft.py): forward and
    inverse Stockham along the sublane axis vs jnp.fft at f32 tolerance,
    interpret mode (runs on CPU; the TPU compile + tie-with-backend
    measurement is recorded in the module docstring)."""
    import numpy as np
    import jax.numpy as jnp
    from professad_tpu.ops.vpufft import fft_sublane, ifft_sublane

    rng = np.random.default_rng(0)
    n, B = 32, 256
    xr = jnp.asarray(rng.standard_normal((n, B)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((n, B)), jnp.float32)
    ref = np.fft.fft(np.asarray(xr) + 1j * np.asarray(xi), axis=0)
    gr, gi = fft_sublane(xr, xi, interpret=True)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(np.asarray(gr) - ref.real)) / scale < 1e-6
    assert np.max(np.abs(np.asarray(gi) - ref.imag)) / scale < 1e-6
    # inverse round trip
    br, bi = ifft_sublane(gr, gi, interpret=True)
    assert np.max(np.abs(np.asarray(br) - np.asarray(xr))) < 1e-5
    assert np.max(np.abs(np.asarray(bi) - np.asarray(xi))) < 1e-5


def test_vpufft_rejects_non_power_of_two():
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from professad_tpu.ops.vpufft import fft_sublane
    x = jnp.zeros((24, 128), jnp.float32)
    with pytest.raises(ValueError, match="power-of-two"):
        fft_sublane(x, x, interpret=True)


def test_vpufft_composed_conv3_matches_fftn():
    """The round-5 go/no-go composition (conv3_bfly: real sublane forward,
    middle-axis Stockham, transpose sandwich, fused z-conv) matches
    ifftn(K * fftn(x)).real in interpret mode.  The TPU decision
    measurement (NO-GO: 1.30x slower than the backend at 256^3) is
    recorded in the module docstring and docs/design.md."""
    import numpy as np
    import jax.numpy as jnp
    from professad_tpu.ops.vpufft import (conv3_bfly, fft_mid, ifft_mid,
                                          fft_sublane_real,
                                          ifft_sublane_real_out, sublane_conv)

    rng = np.random.default_rng(3)
    n = 16
    x = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)

    # real-input forward and real-output inverse round trip
    r, i = fft_sublane_real(x.reshape(n, -1), interpret=True)
    ref = np.fft.fft(np.asarray(x.reshape(n, -1)), axis=0)
    s = np.max(np.abs(ref))
    assert np.max(np.abs(np.asarray(r) - ref.real)) / s < 1e-6
    back = ifft_sublane_real_out(r, i, interpret=True)
    assert np.max(np.abs(np.asarray(back) - np.asarray(x.reshape(n, -1)))) < 1e-5

    # middle-axis kernel
    xr = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    mr, mi = fft_mid(xr, xi, interpret=True)
    refm = np.fft.fft(np.asarray(xr) + 1j * np.asarray(xi), axis=1)
    sm = np.max(np.abs(refm))
    assert np.max(np.abs(np.asarray(mr) - refm.real)) / sm < 1e-6
    br, bi = ifft_mid(mr, mi, interpret=True)
    assert np.max(np.abs(np.asarray(br) - np.asarray(xr))) < 1e-5

    # fused sublane convolution
    k = jnp.asarray(rng.standard_normal((n, n * n)), jnp.float32)
    cr, ci = sublane_conv(x.reshape(n, -1), jnp.zeros((n, n * n), jnp.float32),
                          k, interpret=True)
    refc = np.fft.ifft(np.asarray(k) * np.fft.fft(
        np.asarray(x.reshape(n, -1)), axis=0), axis=0)
    assert np.max(np.abs(np.asarray(cr) - refc.real)) < 1e-5

    # the full composed 3-D conv with a Hermitian-even (real-output) kernel
    Kf = rng.standard_normal((n, n, n)).astype(np.float32)
    idx = (np.arange(n) * -1) % n
    Kf = 0.5 * (Kf + Kf[np.ix_(idx, idx, idx)])
    y = conv3_bfly(x, jnp.asarray(np.transpose(Kf, (2, 1, 0))),
                   interpret=True)
    ref3 = np.fft.ifftn(Kf * np.fft.fftn(np.asarray(x))).real
    assert (np.max(np.abs(np.asarray(y) - ref3))
            / np.max(np.abs(ref3))) < 1e-6
