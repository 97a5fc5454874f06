"""Geometry optimization (mirrors tutorial_examples/geometry_optimization/).

* Conventional relaxation: perturb a bcc-Li cell and ionic positions, then
  relax both back with autodiff forces and stresses driving L-BFGS.
* Parameterized relaxation: relax an hcp cell over (a, c/a) only — a
  symmetry-constrained geometry given as a pure function of the parameter
  vector (reference system.py:1066-1198).

Run:  python examples/geometry_optimization.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run


import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree,
                                  SmargiassiMadden, PerdewBurkeErnzerhof)

POT = os.path.join(os.path.dirname(__file__), "..", "tests", "potentials",
                   "li.gga.recpot")

# ---- conventional relaxation of a rattled bcc-Li cell ---------------------
a = 3.48
box_vecs = a * jnp.asarray([[1.00, 0.02, 0.00],
                            [0.00, 1.00, 0.03],
                            [0.01, 0.00, 1.00]])   # sheared cell
frac = jnp.asarray([[0.02, 0.00, 0.01],
                    [0.51, 0.49, 0.52]])           # displaced ions
ions = [["Li", POT, frac]]
terms = [IonIon, IonElectron, Hartree, SmargiassiMadden,
         PerdewBurkeErnzerhof]
system = System(box_vecs, (18, 18, 18), ions, terms, units="a",
                coord_type="fractional")

print("relaxing ions + cell ...")
ok = system.optimize_geometry(ftol=0.01, stol=0.002, g_verbose=True,
                              ntol=1e-8)
print(f"converged: {ok}")
print("final lattice [A]:")
print(np.array2string(np.asarray(system.lattice_vectors('a')), precision=4))
print("final fractional coordinates:")
print(np.array2string(np.asarray(system.fractional_ionic_coordinates()),
                      precision=4))

# ---- parameterized relaxation: hcp over (a, c/a) ---------------------------
print("\nparameterized hcp relaxation over (a, c/a) ...")


def hcp_geometry_b(p):
    """hcp cell (in Bohr) as a pure function of (a, c/a)."""
    a_len, c_over_a = p[0], p[1]
    box = a_len * jnp.stack([
        jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([-0.5, float(np.sqrt(3.0)) / 2.0, 0.0]),
        c_over_a * jnp.asarray([0.0, 0.0, 1.0]),
    ])
    frac = jnp.asarray([[1 / 3, 2 / 3, 0.75], [2 / 3, 1 / 3, 0.25]])
    return box, frac


box0, frac0 = hcp_geometry_b(jnp.asarray([6.0, 1.64]))
hcp = System(box0, (16, 16, 24), [["Li", POT, frac0]], terms, units="b",
             coord_type="fractional")
ok, p_opt = hcp.optimize_parameterized_geometry(
    jnp.asarray([6.0, 1.64]), hcp_geometry_b, ftol=None, stol=0.003,
    g_verbose=True, ntol=1e-8,
    param_string=lambda p: f"  a={float(p[0]):.4f} c/a={float(p[1]):.4f}")
print(f"converged: {ok}; a = {float(p_opt[0]):.4f} bohr, "
      f"c/a = {float(p_opt[1]):.4f}")
