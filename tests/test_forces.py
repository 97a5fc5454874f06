"""Hellmann-Feynman forces vs central finite differences.

Internal cross-validation tier (SURVEY.md section 4, tier 4): the one-pass
``jax.grad`` forces on a triclinic Li2 cell must agree with -dE/dR computed
by re-optimizing the density at displaced ionic positions (coverage parity
with /root/reference/tests/test_forces.py at the same eps/atol).
"""

import itertools

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  PerdewBurkeErnzerhof)
from paths import pot

EPS = 1e-4  # Angstrom displacement for the FD stencil


def _triclinic_li2():
    cell = jnp.asarray([[3.54, -0.13, 0.25],
                        [-0.33, 3.82, 0.24],
                        [0.55, 0.04, 3.45]])
    fracs = jnp.asarray([[0.0, 0.0, 0.0], [0.35, 0.65, 0.45]])
    return System(
        cell, System.ecut2shape(1600, cell),
        [["Li", pot("li.gga.recpot"), fracs]],
        [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof],
        units="a", coord_type="fractional")


def _reoptimized_energy(system, positions):
    system.place_ions(positions, units="a")
    system.optimize_density(ntol=1e-8)
    return system.energy("eV")


def test_forces_match_finite_differences():
    system = _triclinic_li2()
    system.optimize_density(ntol=1e-8)
    R0 = np.asarray(system.cartesian_ionic_coordinates("a"))
    F_ad = np.asarray(system.forces("eV/a"))

    F_fd = np.zeros_like(F_ad)
    for ion, axis in itertools.product(range(R0.shape[0]), range(3)):
        step = np.zeros_like(R0)
        step[ion, axis] = EPS
        dE = (_reoptimized_energy(system, R0 + step)
              - _reoptimized_energy(system, R0 - step))
        F_fd[ion, axis] = -dE / (2 * EPS)

    assert np.allclose(F_ad, F_fd, atol=1e-4), np.abs(F_ad - F_fd).max()
