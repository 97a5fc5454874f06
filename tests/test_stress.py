"""Tier-1: autograd vs hand-derived stresses at rtol 1e-10, plus the
P = -tr(sigma)/3 identity (parity: /root/reference/tests/test_stress.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, ThomasFermi,
                                  Weizsaecker, WangTeter, Perrot,
                                  SmargiassiMadden, WangGovindCarter98,
                                  WangTeterStyleFunctional, lda_exchange,
                                  perdew_zunger_correlation,
                                  perdew_wang_correlation,
                                  chachiyo_correlation, pbe_exchange,
                                  pbe_correlation, PerdewBurkeErnzerhof)
from professad_tpu.ops.autodiff import get_stress, get_pressure
from paths import pot

import tools_for_tests as tt


@pytest.fixture(scope="module")
def li2_state():
    shape = (25, 25, 25)
    box_vecs = jnp.asarray([[6.5, -0.13, 0.25],
                            [-0.33, 7.21, 0.24],
                            [0.55, 0.04, 6.78]])
    frac_ion_coords = jnp.asarray([[0.0, 0.0, 0.0], [0.35, 0.65, 0.45]])
    ions = [["Li", pot("li.gga.recpot"), frac_ion_coords]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    system = System(box_vecs, shape, ions, terms, units="b",
                    coord_type="fractional")
    system.optimize_density(ntol=1e-8)
    return system.lattice_vectors(), system.density()


CASES = [
    ("Hartree", Hartree, tt.hartree_stress),
    ("TF", ThomasFermi, tt.TF_stress),
    ("vW", Weizsaecker, tt.vW_stress),
    ("WT", WangTeter,
     lambda b, n: tt.non_local_KEF_stress(b, n, 5 / 6, 5 / 6)),
    ("Perrot", Perrot, lambda b, n: tt.non_local_KEF_stress(b, n, 1.0, 1.0)),
    ("SM", SmargiassiMadden,
     lambda b, n: tt.non_local_KEF_stress(b, n, 0.5, 0.5)),
    ("WGC98", WangGovindCarter98,
     lambda b, n: tt.non_local_KEF_stress(b, n, (5 + np.sqrt(5)) / 6,
                                          (5 - np.sqrt(5)) / 6)),
    ("LDAx", lda_exchange, tt.lda_exchange_stress),
    ("PZc", perdew_zunger_correlation, tt.perdew_zunger_correlation_stress),
    ("PWc", perdew_wang_correlation, tt.perdew_wang_correlation_stress),
    ("Chachiyo", chachiyo_correlation, tt.chachiyo_correlation_stress),
    ("PBEx", pbe_exchange, tt.pbe_exchange_stress),
    ("PBEc", pbe_correlation, tt.pbe_correlation_stress),
]


@pytest.mark.parametrize("name,functional,analytic", CASES,
                         ids=[c[0] for c in CASES])
def test_stresses(li2_state, name, functional, analytic):
    box_vecs, den = li2_state
    ag = get_stress(box_vecs, den, functional)
    th = analytic(box_vecs, den)
    assert np.allclose(np.asarray(ag), np.asarray(th), rtol=1e-10)


def test_pressure_trace_identities(li2_state):
    box_vecs, den = li2_state
    for functional in (WangTeter, pbe_exchange, pbe_correlation):
        sigma = get_stress(box_vecs, den, functional)
        p = float(get_pressure(box_vecs, den, functional))
        assert np.allclose(p, -float(jnp.trace(sigma)) / 3, rtol=1e-10)


def test_pauli_stabilized_stress(li2_state):
    box_vecs, den = li2_state
    WTexp = WangTeterStyleFunctional((5 / 6, 5 / 6, lambda x: jnp.exp(x)))
    ag = get_stress(box_vecs, den, WTexp.forward)
    th = tt.pauli_stabilized_stress(box_vecs, den, alpha=5 / 6, beta=5 / 6,
                                    f=jnp.exp, fprime=jnp.exp)
    assert np.allclose(np.asarray(ag), np.asarray(th), rtol=1e-10)
    p = float(get_pressure(box_vecs, den, WTexp.forward))
    assert np.allclose(p, -float(jnp.trace(ag)) / 3, rtol=1e-10)

    a, b = (5 + np.sqrt(5)) / 6, (5 - np.sqrt(5)) / 6
    WGC98exp = WangTeterStyleFunctional((a, b, lambda x: jnp.exp(x)))
    ag = get_stress(box_vecs, den, WGC98exp.forward)
    th = tt.pauli_stabilized_stress(box_vecs, den, alpha=a, beta=b,
                                    f=jnp.exp, fprime=jnp.exp)
    assert np.allclose(np.asarray(ag), np.asarray(th), rtol=1e-10)


def test_system_pressure_vs_stress_trace():
    """P == -tr(sigma)/3 end-to-end through System
    (parity: test_stress.py:129-148)."""
    box_vecs = jnp.asarray([[3.54, -0.13, 0.25],
                            [-0.33, 3.82, 0.24],
                            [0.55, 0.04, 3.45]])
    shape = System.ecut2shape(1000, box_vecs)
    frac_ion_coords = jnp.asarray([[0.0, 0.0, 0.0], [0.35, 0.65, 0.45]])
    ions = [["Li", pot("li.gga.recpot"), frac_ion_coords]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    system = System(box_vecs, shape, ions, terms, units="a",
                    coord_type="fractional")
    system.optimize_density()
    pressure = system.pressure("GPa")
    stress = system.stress("GPa")
    assert abs(pressure - (-float(jnp.trace(stress)) / 3)) < 1e-6
