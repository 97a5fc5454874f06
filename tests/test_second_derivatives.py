"""Second derivatives through the ground state vs finite differences.

Validates the implicit-function-theorem layer (ops/implicit.py +
System.bulk_modulus / elastic_constants / force_constants), the analogue of
the reference's xitorch ``minimize(..., maxiter=0)`` path
(reference system.py:1204-1338) — which the reference test suite itself
never covers.  Internal cross-validation tier (SURVEY.md section 4, tier 4):
implicit-autodiff values must match central finite differences of
re-optimized energies/stresses.
"""

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  PerdewBurkeErnzerhof)
from paths import pot

GPA = 29421.02648438959  # Ha/bohr^3 -> GPa


def _fcc_al(shape=(10, 10, 10)):
    box_vecs = 4.05 * jnp.asarray([[0.5, 0.5, 0.0],
                                   [0.0, 0.5, 0.5],
                                   [0.5, 0.0, 0.5]])
    ions = [["Al", pot("al.gga.recpot"), jnp.zeros((1, 3))]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    return System(box_vecs, shape, ions, terms, units="a",
                  coord_type="fractional")


def test_bulk_modulus_and_elastic_constants_vs_fd():
    s = _fcc_al()
    s.optimize_density(ntol=1e-10)
    K_imp = s.bulk_modulus("GPa")
    C = np.asarray(s.elastic_constants("GPa"))
    lv0 = np.asarray(s.lattice_vectors("a"))
    V0 = s.volume("b3")
    eps = 4e-3

    # FD bulk modulus from re-optimized energies at scaled volumes
    es = []
    for f in (1 - eps, 1.0, 1 + eps):
        s2 = _fcc_al()
        s2.set_lattice(lv0 * f ** (1.0 / 3.0), units="a")
        s2.optimize_density(ntol=1e-12, n_maxiter=3000)
        es.append(s2.energy())
    K_fd = V0 * (es[0] - 2 * es[1] + es[2]) / (V0 * eps) ** 2 * GPA
    assert np.isclose(K_imp, K_fd, rtol=2e-2), (K_imp, K_fd)

    # FD pressure from the same energies (first derivative sanity)
    P_fd = -(es[2] - es[0]) / (2 * V0 * eps) * GPA
    assert np.isclose(s.pressure("GPa"), P_fd, rtol=5e-3, atol=5e-3)

    # FD elastic constants from re-optimized stresses under x-strain
    ss = []
    for f in (1 - eps, 1 + eps):
        s2 = _fcc_al()
        strain = np.eye(3)
        strain[0, 0] = f
        s2.set_lattice(lv0 @ strain.T, units="a")
        s2.optimize_density(ntol=1e-12, n_maxiter=3000)
        ss.append(np.asarray(s2.stress("GPa")))
    dsig = (ss[1] - ss[0]) / (2 * eps)
    assert np.isclose(C[0, 0], dsig[0, 0], rtol=2e-2), (C[0, 0], dsig[0, 0])
    assert np.isclose(C[0, 1], dsig[1, 1], rtol=2e-2), (C[0, 1], dsig[1, 1])

    # cubic symmetry of the assembled matrix
    assert np.isclose(C[0, 0], C[1, 1], rtol=1e-3)
    assert np.isclose(C[0, 1], C[0, 2], rtol=1e-3)


def test_force_constants_vs_fd():
    """Phi[0, 1] = -dF_0/dR_1 must match central finite differences of
    re-optimized forces.  (The acoustic sum rule is NOT tested: at this
    coarse grid the egg-box effect breaks rigid-translation invariance by
    design, and finite differences confirm the implicit values including
    that effect.)"""
    box_vecs = 3.48 * jnp.eye(3)
    frac = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    ions = [["Li", pot("li.gga.recpot"), frac]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    s = System(box_vecs, (10, 10, 10), ions, terms, units="a",
               coord_type="fractional")
    s.optimize_density(ntol=1e-10)
    FC = np.asarray(s.force_constants([0], units="Ha/b2"))  # (1, N, 3, 3)

    cart0 = np.asarray(s.cartesian_ionic_coordinates("b"))
    eps = 1e-3
    Fs = []
    for d in (-eps, eps):
        c = cart0.copy()
        c[1, 0] += d
        s.place_ions(jnp.asarray(c), "cartesian", "b")
        s.optimize_density(ntol=1e-12, n_maxiter=2000)
        Fs.append(np.asarray(s.forces("Ha/b")))
    dF0_dR1x = (Fs[1][0] - Fs[0][0]) / (2 * eps)
    assert np.allclose(FC[0, 1][:, 0], -dF0_dR1x, atol=2e-5), \
        (FC[0, 1][:, 0], -dF0_dR1x)
