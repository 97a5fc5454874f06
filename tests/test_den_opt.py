"""Exactly-solvable physics + optimizer cross-validation (coverage parity
with /root/reference/tests/test_den_opt.py: the hydrogen atom, the 3-D
quantum harmonic oscillator, and LBFGS-vs-TPGD agreement at the same
tolerances)."""

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, Weizsaecker,
                                  LuoKarasievTrickey, WangTeter,
                                  PerdewBurkeErnzerhof)
from professad_tpu.utils.crystal import get_cell
from paths import pot

BOX_L = 20.0  # bohr — large box for non-interacting single-orbital systems


def _vw_only_system(ecut_eV=250):
    """H nucleus in a big box with von Weizsaecker-only kinetic energy
    (exact for one orbital)."""
    cell = BOX_L * jnp.eye(3)
    sys_ = System(cell, System.ecut2shape(ecut_eV, cell),
                  [["H", pot("H.coulomb-kcut-15.recpot"),
                    jnp.asarray([[0.5, 0.5, 0.5]])]],
                  [IonElectron, Weizsaecker], units="b",
                  coord_type="fractional")
    sys_.set_electron_number(1)
    return sys_


def test_hydrogen_atom_energy():
    sys_ = _vw_only_system()
    sys_.optimize_density(ntol=1e-4)
    assert abs(sys_.energy("Ha") + 0.5) < 5e-3  # E_exact = -1/2 Ha


def test_quantum_harmonic_oscillator_energy():
    sys_ = _vw_only_system()
    spring_k = 10.0

    # harmonic well centered in the box, built on the real-space grid
    grid = sys_._shape
    fr = np.stack(np.meshgrid(*(np.arange(s) / s for s in grid),
                              indexing="ij"), axis=-1)
    r = fr @ np.asarray(BOX_L * np.eye(3))
    r2 = np.sum((r - BOX_L / 2.0) ** 2, axis=-1)
    sys_.set_potential(jnp.asarray(0.5 * spring_k * r2))

    sys_.initialize_density()
    sys_.optimize_density(ntol=1e-4)
    assert abs(sys_.energy("Ha") - 1.5 * np.sqrt(spring_k)) < 5e-6


def _fcc_al_system(kinetic, ecut_eV=1600):
    cell, fracs = get_cell("fcc", vol_per_atom=16.8)
    return System(cell, System.ecut2shape(ecut_eV, cell),
                  [["Al", pot("al.gga.recpot"), fracs]],
                  [IonIon, IonElectron, Hartree, kinetic,
                   PerdewBurkeErnzerhof],
                  units="a", coord_type="fractional")


def test_lbfgs_and_tpgd_agree():
    sys_ = _fcc_al_system(LuoKarasievTrickey)
    sys_.optimize_density(ntol=1e-4, n_method="LBFGS")
    E_lbfgs = sys_.energy("eV")
    sys_.initialize_density()
    sys_.optimize_density(ntol=1e-4, n_conv_cond_count=5, n_method="TPGD")
    assert abs(E_lbfgs - sys_.energy("eV")) < 5e-4


def test_jit_loop_matches_host_loop_all_conv_targets():
    """The whole-optimization while_loop path must land on the host loop's
    energy under every stopping criterion (reference criteria:
    system.py:866-906)."""
    import pytest

    for conv_target, tol in (("dE", 1e-7), ("dEdchi", 1e-4), ("euler", 1e-4)):
        sys_host = _fcc_al_system(WangTeter, ecut_eV=600)
        sys_host.optimize_density(ntol=tol, conv_target=conv_target)
        sys_jit = _fcc_al_system(WangTeter, ecut_eV=600)
        sys_jit.optimize_density(ntol=tol, conv_target=conv_target,
                                 jit_loop=True)
        assert abs(sys_host.energy("eV") - sys_jit.energy("eV")) < 1e-6, \
            conv_target

    # TPGD is also supported under jit_loop (with the optional exact
    # spectral preconditioner it is the TPU fast path used by bench.py)
    sys_tpgd = _fcc_al_system(WangTeter, ecut_eV=600)
    sys_tpgd.optimize_density(ntol=1e-8, jit_loop=True, n_method="TPGD",
                              n_step_size=1.0, precondition=True,
                              skip_iters=2)
    sys_host = _fcc_al_system(WangTeter, ecut_eV=600)
    sys_host.optimize_density(ntol=1e-8)
    assert abs(sys_host.energy("eV") - sys_tpgd.energy("eV")) < 1e-6

    sys_ = _fcc_al_system(WangTeter, ecut_eV=600)
    with pytest.raises(ValueError):
        sys_.optimize_density(jit_loop=True, n_method="RPROP")
    with pytest.raises(ValueError):
        sys_.optimize_density(jit_loop=True, conv_target="bogus")


def test_initialize_density_refreshes_energy():
    """initialize_density() must refresh the stored energy so energy()
    reflects the uniform reset (the reference leaves the stale pre-reset
    value in place; docs/design.md round-5 note)."""
    sys_ = _fcc_al_system(WangTeter, ecut_eV=600)
    E_uniform = sys_.energy("eV")
    sys_.optimize_density(ntol=1e-4)
    E_min = sys_.energy("eV")
    assert E_min < E_uniform - 1e-3
    sys_.initialize_density()
    assert abs(sys_.energy("eV") - E_uniform) < 1e-9


def test_convergence_measures_consistent():
    """max |dE/dchi| reported by the optimizer equals the value rebuilt from
    the density-space functional derivative and the chain rule."""
    sys_ = _fcc_al_system(WangTeter)
    sys_.optimize_density(ntol=1e-4)

    reported = sys_.check_density_convergence()

    dEdn = sys_.functional_derivative("density")
    chi = jnp.sqrt(sys_.density())
    N_tilde = jnp.mean(chi**2) * sys_.volume()
    mu = jnp.mean(dEdn * sys_.density()) * sys_.volume() / sys_.electron_count()
    rebuilt = (sys_.electron_count() / N_tilde) * 2.0 * chi * (dEdn - mu)
    assert np.allclose(reported, float(jnp.max(jnp.abs(rebuilt))), rtol=1e-10)
