"""Autograd forces vs central finite differences of re-optimized energies
(parity: /root/reference/tests/test_forces.py, eps 1e-4, atol 1e-4)."""

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  PerdewBurkeErnzerhof)
from paths import pot


def test_forces():
    box_vecs = jnp.asarray([[3.54, -0.13, 0.25],
                            [-0.33, 3.82, 0.24],
                            [0.55, 0.04, 3.45]])
    shape = System.ecut2shape(1600, box_vecs)
    frac_ion_coords = jnp.asarray([[0.0, 0.0, 0.0], [0.35, 0.65, 0.45]])
    ions = [["Li", pot("li.gga.recpot"), frac_ion_coords]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    system = System(box_vecs, shape, ions, terms, units="a",
                    coord_type="fractional")
    system.optimize_density(ntol=1e-8)
    cart_ion_coords = system.cartesian_ionic_coordinates("a")
    autograd_forces = system.forces("eV/a")

    E_plus = np.empty((2, 3))
    E_minus = np.empty((2, 3))
    eps = 1e-4
    for ion in range(2):
        for i in range(3):
            perturbation = np.zeros((2, 3))
            perturbation[ion, i] += eps
            system.place_ions(cart_ion_coords + perturbation, units="a")
            system.optimize_density(ntol=1e-8)
            E_plus[ion, i] = system.energy("eV")
            system.place_ions(cart_ion_coords - perturbation, units="a")
            system.optimize_density(ntol=1e-8)
            E_minus[ion, i] = system.energy("eV")
    finite_diff_forces = -(E_plus - E_minus) / (2 * eps)

    assert np.allclose(np.asarray(autograd_forces), finite_diff_forces,
                       atol=1e-4)
