"""System checkpointing and profiling-utility tests (new subsystems;
SURVEY.md sections 5.1/5.4 rebuild items)."""

import os

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  PerdewBurkeErnzerhof)
from professad_tpu.utils import StepTimer
from paths import pot


def _fcc_al(shape=(12, 12, 12)):
    box_vecs = 4.05 * jnp.asarray([[0.5, 0.5, 0.0],
                                   [0.0, 0.5, 0.5],
                                   [0.5, 0.0, 0.5]])
    ions = [["Al", pot("al.gga.recpot"), jnp.zeros((1, 3))]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    return System(box_vecs, shape, ions, terms, units="a",
                  coord_type="fractional")


def test_system_checkpoint_roundtrip(tmp_path):
    sys1 = _fcc_al()
    sys1.optimize_density(ntol=1e-6, n_maxiter=40)
    E1 = sys1.energy()
    path = os.path.join(tmp_path, "ckpt.pkl")
    sys1.save(path)

    sys2 = _fcc_al()
    assert not np.isclose(sys2.energy(), E1)  # fresh system differs
    sys2.load(path)
    assert np.isclose(sys2.energy(), E1, rtol=1e-12)
    assert np.allclose(np.asarray(sys2.density()), np.asarray(sys1.density()))


def test_checkpoint_rejects_mismatched_system(tmp_path):
    import pickle
    import pytest

    sys1 = _fcc_al()
    path = os.path.join(tmp_path, "ckpt.pkl")
    sys1.save(path)

    wrong_shape = _fcc_al(shape=(10, 10, 10))
    with pytest.raises(ValueError):
        wrong_shape.load(path)

    with open(path, "rb") as fh:
        state = pickle.load(fh)
    state["ions"] = [("Li", "li.gga.recpot", 1, 1)]
    with pytest.raises(ValueError):
        sys1.load_state_dict(state)


def test_step_timer():
    t = StepTimer().start()
    x = jnp.arange(1000.0)
    for _ in range(3):
        x = x * 1.0001
        t.tick(x)
    s = t.summary()
    assert s["steps"] == 3
    assert s["total_s"] > 0
    assert np.isclose(s["steps_per_s"], 3 / s["total_s"])


def test_radial_precond_kernel_matches_full_hvp():
    """The radially-sampled preconditioner kernel (the >256^3 memory path:
    1-D ray HVP + cubic Hermite in |k|) must agree with the full-grid HVP
    kernel up to one k-independent scale (the grid quadrature factor,
    which the BB/L-BFGS H_diag rescale cancels identically)."""
    s = _fcc_al(shape=(16, 20, 24))  # anisotropic grid exercises |k| query
    Ne = float(s._N_elec)
    M3 = np.asarray(s._exact_precond_kernel(s._box_vecs, Ne))
    Mr = np.asarray(s._exact_precond_kernel_radial(s._box_vecs, Ne))
    r = M3 / Mr
    med = np.median(r)
    # M-space Hermite interpolation: measured 1.2e-6 at 32^3/n1d=4096
    # (F-space interpolation of the 1/k^2-singular Hartree response was
    # ~100x worse at the lowest modes)
    assert np.max(np.abs(r / med - 1.0)) < 1e-5, np.max(np.abs(r / med - 1.0))


def test_precond_kernel_auto_selects_hvp_below_threshold():
    """_precond_kernel keeps the bit-exact full HVP at small grids (the
    radial surrogate only engages above 256^3)."""
    s = _fcc_al(shape=(12, 12, 12))
    Ne = float(s._N_elec)
    M = np.asarray(s._precond_kernel(s._box_vecs, Ne))
    M3 = np.asarray(s._jit_precond_kernel(s._box_vecs, Ne, None))
    assert np.array_equal(M, np.asarray(M3))
