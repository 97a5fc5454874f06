"""Functional-derivative and linear-response autodiff utilities
(mirrors tutorial_examples/autodiff_utils/ in spirit).

* delta T / delta n for the Wang-Teter functional on an optimized density,
  compared against the Euler equation mu = dE/dn.
* G^{-1}(eta) of WT from two nested autodiff passes, compared with the
  closed-form Lindhard function.

Run:  python examples/autodiff_utils.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run


import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  PerdewBurkeErnzerhof, G_inv_lindhard)
from professad_tpu.ops.autodiff import get_functional_derivative, get_inv_G

POT = os.path.join(os.path.dirname(__file__), "..", "tests", "potentials",
                   "al.gga.recpot")

box_vecs = 4.050 * jnp.asarray([[0.5, 0.5, 0.0],
                                [0.0, 0.5, 0.5],
                                [0.5, 0.0, 0.5]])
ions = [["Al", POT, jnp.zeros((1, 3))]]
terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
system = System(box_vecs, (20, 20, 20), ions, terms, units="a",
                coord_type="fractional")
system.optimize_density(ntol=1e-8)

# functional derivative (kinetic potential) on the optimized density
den = system.density()
v_T = get_functional_derivative(system._box_vecs, den, WangTeter)
print(f"kinetic potential range: [{float(jnp.min(v_T)):.4f}, "
      f"{float(jnp.max(v_T)):.4f}] Ha")

# at the ground state, dE/dn == mu (constant): check the spread
dEdn = system.functional_derivative("density")
mu = system.chemical_potential()
print(f"Euler residual max |mu - dE/dn| = "
      f"{float(jnp.max(jnp.abs(mu - dEdn))):.3e} Ha")

# linear response of WT about the uniform gas == Lindhard
uniform = jnp.ones((41, 41, 41))
box = 8.0 * jnp.eye(3)
eta, G_inv_WT = get_inv_G(box, uniform, WangTeter)
_, G_inv_L = G_inv_lindhard(box, uniform)
err = float(jnp.max(jnp.abs(jnp.asarray(G_inv_WT) - G_inv_L)))
print(f"max |G_inv(WT) - G_inv(Lindhard)| = {err:.3e}")
