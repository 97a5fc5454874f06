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
