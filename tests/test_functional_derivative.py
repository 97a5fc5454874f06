"""Tier-1: autograd vs hand-derived functional derivatives at rtol 1e-10
(parity: /root/reference/tests/test_functional_derivative.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, ThomasFermi,
                                  Weizsaecker, WangTeter, Perrot,
                                  SmargiassiMadden, WangGovindCarter98,
                                  LuoKarasievTrickey, PauliGaussian,
                                  lda_exchange, perdew_zunger_correlation,
                                  perdew_wang_correlation,
                                  chachiyo_correlation, pbe_exchange,
                                  pbe_correlation, PerdewBurkeErnzerhof,
                                  hartree_potential)
from professad_tpu.ops.autodiff import get_functional_derivative
from professad_tpu.utils.crystal import get_cell
from paths import pot

import tools_for_tests as tt


@pytest.fixture(scope="module")
def li2_state():
    """Optimized Li2 density used as the common evaluation point."""
    shape = (25, 25, 25)
    box_len = 6.96
    box_vecs = box_len * jnp.eye(3)
    ions = [["Li", pot("li.gga.recpot"),
             box_len * jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    system = System(box_vecs, shape, ions, terms, units="b")
    system.optimize_density()
    return (system.lattice_vectors(), system.density(),
            system.ionic_potential())


CASES = [
    ("TF", ThomasFermi, tt.TF_kp),
    ("vW", Weizsaecker, tt.vW_kp),
    ("WT", WangTeter, lambda b, n: tt.non_local_KEFD(b, n, 5 / 6, 5 / 6)),
    ("Perrot", Perrot, lambda b, n: tt.non_local_KEFD(b, n, 1.0, 1.0)),
    ("SM", SmargiassiMadden, lambda b, n: tt.non_local_KEFD(b, n, 0.5, 0.5)),
    ("WGC98", WangGovindCarter98,
     lambda b, n: tt.non_local_KEFD(b, n, (5 + np.sqrt(5)) / 6,
                                    (5 - np.sqrt(5)) / 6)),
    ("LKT", LuoKarasievTrickey, tt.LKT_kp),
    ("LDAx", lda_exchange, tt.lda_exchange_potential),
    ("PZc", perdew_zunger_correlation, tt.perdew_zunger_correlation_potential),
    ("PWc", perdew_wang_correlation, tt.perdew_wang_correlation_potential),
    ("Chachiyo", chachiyo_correlation, tt.chachiyo_correlation_potential),
    ("PBEx", pbe_exchange, tt.pbe_exchange_potential),
    ("PBEc", pbe_correlation, tt.pbe_correlation_potential),
]


@pytest.mark.parametrize("name,functional,analytic", CASES,
                         ids=[c[0] for c in CASES])
def test_functional_derivatives(li2_state, name, functional, analytic):
    box_vecs, den, _ = li2_state
    ag = get_functional_derivative(box_vecs, den, functional)
    th = analytic(box_vecs, den)
    assert np.allclose(np.asarray(ag), np.asarray(th), rtol=1e-10)


def test_ion_electron_derivative(li2_state):
    box_vecs, den, v_ext = li2_state
    ag = get_functional_derivative(
        box_vecs, den, lambda bv, n: IonElectron(bv, n, v_ext))
    assert np.allclose(np.asarray(ag), np.asarray(v_ext), rtol=1e-10)


def test_hartree_derivative(li2_state):
    box_vecs, den, _ = li2_state
    ag = get_functional_derivative(box_vecs, den, Hartree)
    th = hartree_potential(box_vecs, den)
    assert np.allclose(np.asarray(ag), np.asarray(th), rtol=1e-10)


def test_pauli_gaussian_derivatives(li2_state):
    box_vecs, den, _ = li2_state
    pg = PauliGaussian()
    pg.set_PG1()
    ag = get_functional_derivative(box_vecs, den, pg.forward)
    assert np.allclose(np.asarray(ag), np.asarray(tt.PG1_kp(box_vecs, den)),
                       rtol=1e-10)
    pg.set_PGSL025()
    ag = get_functional_derivative(box_vecs, den, pg.forward)
    assert np.allclose(np.asarray(ag), np.asarray(tt.PGSL_kp(box_vecs, den)),
                       rtol=1e-10)


def test_density_optimization_with_explicit_potentials():
    """Autograd gradients vs explicitly supplied analytic potentials driving
    the same optimizer (parity: test_functional_derivative.py:120-139)."""
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    box_vecs, frac_ion_coords = get_cell("fcc", vol_per_atom=16.8,
                                         coord_type="fractional")
    ions = [["Al", pot("al.gga.recpot"), frac_ion_coords]]
    shape = System.ecut2shape(1600, box_vecs)
    system = System(box_vecs, shape, ions, terms, units="a",
                    coord_type="fractional")
    system.optimize_density()
    E1, den1 = system.energy(), system.density()
    system.initialize_density()

    v_ext = system.ionic_potential()

    def dEdn(bv, n):
        return (v_ext + hartree_potential(bv, n)
                + tt.non_local_KEFD(bv, n, alpha=5 / 6, beta=5 / 6)
                + tt.pbe_exchange_potential(bv, n)
                + tt.pbe_correlation_potential(bv, n))

    system.optimize_density(potentials=dEdn)
    E2, den2 = system.energy(), system.density()
    assert np.allclose(E1, E2, rtol=1e-7)
    assert np.allclose(np.asarray(den1), np.asarray(den2), atol=1e-5)
