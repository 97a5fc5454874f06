"""Failure-path tests for the round-3 robustness sweep (VERDICT round 2,
'Robustness sweep' + ADVICE items): zero-safe powr, singular-cell guard,
shape-validation raises, batched-EOS failure modes, geometry frac re-wrap,
library-level naive field-dependent convolution, CG residual diagnostics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  PerdewBurkeErnzerhof, YukawaGGA)
from professad_tpu.ops.grid import powr, inv3x3, wavevecs
from paths import pot


def _fcc_al(shape=(12, 12, 12)):
    box_vecs = 4.05 * jnp.asarray([[0.5, 0.5, 0.0],
                                   [0.0, 0.5, 0.5],
                                   [0.5, 0.0, 0.5]])
    ions = [["Al", pot("al.gga.recpot"), jnp.zeros((1, 3))]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    return System(box_vecs, shape, ions, terms, units="a",
                  coord_type="fractional")


# ---------------------------------------------------------------- powr ----

def test_powr_zero_safe_positive_exponents():
    """powr(0, p) == 0 for p > 0 like ``**`` (ADVICE r2 medium: the cube-root
    Newton step used to produce 0/0 -> NaN at exact density zeros)."""
    x = jnp.asarray([0.0, 1e-12, 1.0, 2.0], dtype=jnp.float32)
    for p in (1.0 / 3.0, 2.0 / 3.0, 5.0 / 3.0, 0.5, 1.0 / 6.0):
        out = np.asarray(powr(x, p))
        ref = np.asarray(x, dtype=np.float64) ** p
        assert np.isfinite(out).all(), (p, out)
        assert out[0] == 0.0
        np.testing.assert_allclose(out[1:], ref[1:], rtol=1e-6)


def test_powr_zero_safe_under_grad():
    """Gradients of powr at x=0 must not be NaN for p >= 1 integrands
    (energy densities are n * f(n)-shaped, so the composite is
    differentiable at 0)."""
    f = lambda x: jnp.sum(powr(x, 5.0 / 3.0))
    g = jax.grad(f)(jnp.asarray([0.0, 1.0], dtype=jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


# ------------------------------------------------------------- inv3x3 ----

def test_inv3x3_singular_raises():
    m = jnp.asarray([[1.0, 0.0, 0.0],
                     [2.0, 0.0, 0.0],   # linearly dependent rows
                     [0.0, 0.0, 1.0]])
    with pytest.raises(ValueError, match="singular"):
        inv3x3(m)


def test_inv3x3_traced_path_unaffected():
    m = jnp.eye(3) * 2.0
    out = jax.jit(inv3x3)(m)
    np.testing.assert_allclose(np.asarray(out), np.eye(3) / 2.0, atol=1e-15)


# ----------------------------------------------------- System validation ----

def test_set_potential_and_density_shape_raise():
    s = _fcc_al((8, 8, 8))
    with pytest.raises(ValueError, match="potential"):
        s.set_potential(jnp.zeros((4, 4, 4)))
    with pytest.raises(ValueError, match="density"):
        s.set_density(jnp.zeros((4, 4, 4)))


# -------------------------------------------------------- batched EOS ----

def test_batched_eos_rejects_ladder_terms():
    box_vecs = 4.05 * jnp.asarray([[0.5, 0.5, 0.0],
                                   [0.0, 0.5, 0.5],
                                   [0.5, 0.0, 0.5]])
    ions = [["Al", pot("al.gga.recpot"), jnp.zeros((1, 3))]]
    yuk = YukawaGGA((1.0, 1.0, lambda y, s2, q: y, 1.2))
    terms = [IonIon, IonElectron, Hartree, yuk.forward,
             PerdewBurkeErnzerhof]
    s = System(box_vecs, (8, 8, 8), ions, terms, units="a",
               coord_type="fractional")
    with pytest.raises(ValueError, match="ladder-based"):
        s.eos_fit(N=6, batched=True)


def test_batched_eos_nonconverged_points_raise():
    s = _fcc_al((8, 8, 8))
    # 2 maximum iterations can never satisfy 3 consecutive convergence hits
    with pytest.raises(RuntimeError, match="converged"):
        s.eos_fit(N=6, batched=True, ntol=1e-12, n_maxiter=2)


def test_batched_eos_dtype_f32_matches_f64():
    """eos_fit(batched=True, dtype=jnp.float32): the accelerator fast-path
    recipe — per-volume setup host-side CPU f64, vmapped solve in f32
    (bench.py run_eos_batched runs exactly this on the TPU).  Fitted
    (K0, V0) must agree with the f64 scan to f32-landing accuracy."""
    s = _fcc_al((10, 10, 10))
    params64, _ = s.eos_fit(f=0.04, N=6, ntol=1e-7, batched=True,
                            n_method="TPGD", n_step_size=1.0)
    s2 = _fcc_al((10, 10, 10))
    params32, _ = s2.eos_fit(f=0.04, N=6, ntol=1e-7, batched=True,
                             n_method="TPGD", n_step_size=1.0,
                             dtype=jnp.float32)
    # K0 (curvature, GPa) and V0 (minimum, A^3): f32 energies carry ~1e-7
    # Ha absolute noise into the 4-parameter fit
    np.testing.assert_allclose(np.asarray(params32)[[0, 3]],
                               np.asarray(params64)[[0, 3]], rtol=2e-3)


def test_eos_dtype_requires_batched():
    s = _fcc_al((8, 8, 8))
    with pytest.raises(ValueError, match="batched"):
        s.eos_fit(N=6, dtype=jnp.float32)


def test_batched_eos_honors_lbfgs(capsys):
    s = _fcc_al((10, 10, 10))
    params_l, _ = s.eos_fit(f=0.04, N=6, ntol=1e-9, batched=True,
                            n_method="LBFGS")
    s2 = _fcc_al((10, 10, 10))
    params_t, _ = s2.eos_fit(f=0.04, N=6, ntol=1e-9, batched=True,
                             n_method="TPGD")
    np.testing.assert_allclose(np.asarray(params_l), np.asarray(params_t),
                               rtol=1e-5)


# ------------------------------------------------- geometry frac re-wrap ----

def test_geometry_step_rewraps_drifting_ions():
    s = _fcc_al((8, 8, 8))
    # inject an off-cell ion coordinate, as a drifting relaxation could
    s._frac_ion_coords = jnp.asarray([[1.7, -0.3, 0.4]])
    s._update_ionic_potential()
    s.optimize_geometry(ftol=1e10, stol=None, g_maxiter=1,
                        g_conv_cond_count=1, ntol=1e-6, n_maxiter=20)
    frac = np.asarray(s.fractional_ionic_coordinates())
    assert (frac >= 0.0).all() and (frac < 1.0).all(), frac


# --------------------------- naive field-dependent convolution (library) ----

def test_yukawa_spline_flag_naive_matches_spline():
    """YukawaGGA with spline=False runs the exact per-point convolution
    (reference functionals.py:465-471) and agrees with the ladder method."""
    rng = np.random.default_rng(7)
    shape = (6, 6, 6)
    box = jnp.asarray(np.diag([7.0, 7.5, 8.0]))
    den = jnp.asarray(0.5 + 0.2 * rng.random(shape))

    yuk = YukawaGGA((1.0, 1.0, lambda y, s2, q: y, 1.02))
    E_spline = float(yuk.forward(box, den))
    yuk.spline = False
    E_naive = float(yuk.forward(box, den))
    assert abs(E_spline - E_naive) / abs(E_naive) < 1e-5, \
        (E_spline, E_naive)
