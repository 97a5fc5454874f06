"""Geometry-optimization tests (reference system.py:937-1198 — the
reference test suite itself never covers these paths).

Regression context: an earlier version froze the first iteration's density
into the jitted geometry objective (closure capture baked into the trace),
so relaxations stalled at finite forces; these tests relax real perturbed
crystals to below tolerance.
"""

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree,
                                  SmargiassiMadden, WangTeter,
                                  PerdewBurkeErnzerhof)
from paths import pot

TERMS_LI = [IonIon, IonElectron, Hartree, SmargiassiMadden,
            PerdewBurkeErnzerhof]


def test_relax_ions_bcc_li():
    a = 3.48
    box_vecs = a * jnp.eye(3)
    frac = jnp.asarray([[0.02, 0.0, 0.01], [0.51, 0.49, 0.52]])
    ions = [["Li", pot("li.gga.recpot"), frac]]
    s = System(box_vecs, (14, 14, 14), ions, TERMS_LI, units="a",
               coord_type="fractional")
    ok = s.optimize_geometry(ftol=0.02, stol=None, g_maxiter=30, ntol=1e-9)
    assert ok
    assert float(jnp.max(jnp.abs(s.forces("eV/a")))) < 0.02
    # displaced ion returned to the bcc offset (0.5, 0.5, 0.5) relative
    rel = np.asarray(s.fractional_ionic_coordinates())
    d = (rel[1] - rel[0]) % 1.0
    assert np.allclose(d, 0.5, atol=5e-3), d


def test_relax_cell_and_ions_bcc_li():
    a = 3.48
    box_vecs = a * jnp.asarray([[1.0, 0.02, 0.0],
                                [0.0, 1.0, 0.03],
                                [0.01, 0.0, 1.0]])
    frac = jnp.asarray([[0.02, 0.0, 0.01], [0.51, 0.49, 0.52]])
    ions = [["Li", pot("li.gga.recpot"), frac]]
    s = System(box_vecs, (14, 14, 14), ions, TERMS_LI, units="a",
               coord_type="fractional")
    ok = s.optimize_geometry(ftol=0.02, stol=0.003, g_maxiter=40, ntol=1e-9)
    assert ok
    assert float(jnp.max(jnp.abs(s.stress("eV/a3")))) < 0.003


def test_parameterized_geometry_hcp_mg():
    """The reference's Mg hcp tutorial (tutorial_examples/geometry_optimization/
    parameterized_geometry_optimization.py): relax hcp Mg over
    (volume per atom, c/a) with WT-exp + PBE using the cubic-interpolation
    line search.  At the tutorial's 2000 eV cutoff the reference lands at
    V = 23.151 A^3/atom, c/a = 1.630 (docs example_geometry_optimization
    .rst:253); at this test's reduced grid we assert the same basin."""
    from professad_tpu.models import WangTeterStyleFunctional

    A_PER_B = System.A_per_b
    wt_exp = WangTeterStyleFunctional((5.0 / 6.0, 5.0 / 6.0, jnp.exp))
    terms = [IonIon, IonElectron, Hartree, wt_exp.forward,
             PerdewBurkeErnzerhof]

    def geom(p):
        vol_per_atom, c_over_a = jnp.abs(p[0]), jnp.abs(p[1])
        a = ((2.0 * vol_per_atom) / (np.sqrt(3.0) / 2.0 * c_over_a)) ** (1 / 3)
        box = a * jnp.stack([
            jnp.asarray([1.0, 0.0, 0.0]),
            jnp.asarray([-0.5, np.sqrt(3.0) / 2.0, 0.0]),
            c_over_a * jnp.asarray([0.0, 0.0, 1.0]),
        ])
        frac = jnp.asarray([[1 / 3, 2 / 3, 0.75], [2 / 3, 1 / 3, 0.25]])
        return box, frac

    p0 = jnp.asarray([24.0 / A_PER_B**3, 1.5])
    box0, frac0 = geom(p0)
    ions = [["Mg", pot("mg.gga.recpot"), frac0]]
    s = System(box0, (15, 15, 24), ions, terms, units="b",
               coord_type="fractional")
    ok, p_opt = s.optimize_parameterized_geometry(
        p0, geom, ftol=1e-3, stol=1e-3, g_method="LBFGSlinesearch",
        g_maxiter=40, ntol=1e-9)
    assert ok
    vol_A3 = float(jnp.abs(p_opt[0])) * A_PER_B**3
    c_over_a = float(jnp.abs(p_opt[1]))
    assert 21.0 < vol_A3 < 25.5, vol_A3
    assert 1.55 < c_over_a < 1.70, c_over_a


def test_parameterized_geometry_cubic_lattice():
    """Relax fcc-Al over the single lattice-constant parameter; the result
    must be stress-free along the constrained direction."""
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    A_PER_B = System.A_per_b

    def geom(p):
        a_b = p[0]  # lattice constant in bohr
        box = a_b * jnp.asarray([[0.5, 0.5, 0.0],
                                 [0.0, 0.5, 0.5],
                                 [0.5, 0.0, 0.5]])
        return box, jnp.zeros((1, 3))

    a0 = 4.15 / A_PER_B  # start away from equilibrium
    box0, frac0 = geom(jnp.asarray([a0]))
    ions = [["Al", pot("al.gga.recpot"), frac0]]
    s = System(box0, (14, 14, 14), ions, terms, units="b",
               coord_type="fractional")
    ok, p_opt = s.optimize_parameterized_geometry(
        jnp.asarray([a0]), geom, ftol=None, stol=0.002, g_maxiter=40,
        ntol=1e-9)
    assert ok
    a_opt = float(p_opt[0]) * A_PER_B
    assert 3.8 < a_opt < 4.2, a_opt  # near the known ~4.0 A WT+PBE minimum
