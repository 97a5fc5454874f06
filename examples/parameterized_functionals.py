"""Training parameterized kinetic functionals
(mirrors tutorial_examples/parameterized_functionals/ in spirit).

1. Fit a Pauli-Gaussian functional's (mu, beta) so its kinetic potential
   matches the Wang-Teter one on an optimized fcc-Al density.
2. Same task with the MLP NeuralNetworkFunctional — gradients of the loss
   flow through the functional derivative (a second-order autodiff).
3. GROUND-STATE training: fit PG so its re-optimized ground-state energy
   matches the WT one — gradients flow THROUGH the density optimizer via
   ``System.gs_property_fn`` (the reference's ``energy(requires_grad=True)``
   workflow, system.py:459-480).

Run:  python examples/parameterized_functionals.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run


import jax
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  PerdewBurkeErnzerhof, PauliGaussian)
from professad_tpu.models.neural import NeuralNetworkFunctional
from professad_tpu.ops.autodiff import get_functional_derivative
from professad_tpu.utils.crystal import get_cell

POT = os.path.join(os.path.dirname(__file__), "..", "tests", "potentials",
                   "al.gga.recpot")

# reference density: optimized fcc-Al with WT + PBE
box_vecs, frac = get_cell("fcc", vol_per_atom=16.9)
ions = [["Al", POT, frac]]
terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
system = System(box_vecs, (20, 20, 20), ions, terms, units="a",
                coord_type="fractional")
system.optimize_density(ntol=1e-9)
den = system.density()
bv = system.lattice_vectors("b")

# training target: the WT kinetic potential on this density
v_target = get_functional_derivative(bv, den, WangTeter)


def make_loss(functional):
    def loss(params):
        v_pred = get_functional_derivative(
            bv, den, lambda b, n: functional.apply(params, b, n))
        return jnp.mean((v_pred - v_target) ** 2)
    return jax.jit(loss)


# ---- 1. Pauli-Gaussian ------------------------------------------------------
pg = PauliGaussian()
loss_pg = make_loss(pg)
print("training PauliGaussian (mu, beta, lambda, sigma):")
for epoch in range(50):
    l = pg.update_params(loss_pg)
    if epoch % 10 == 0:
        print(f"  epoch {epoch:3d}  loss {float(l):.3e}")
print({k: round(float(v), 4) for k, v in pg.params.items()})

# ---- 2. MLP functional ------------------------------------------------------
nn = NeuralNetworkFunctional([16, 16])
loss_nn = make_loss(nn)
print("training NeuralNetworkFunctional([16, 16]):")
for epoch in range(100):
    l = nn.update_params(loss_nn)
    if epoch % 20 == 0:
        print(f"  epoch {epoch:3d}  loss {float(l):.3e}")

# checkpoint round-trip (reference functionals.py:132-156 equivalent)
nn.save("/tmp/nn_functional.pkl")
nn2 = NeuralNetworkFunctional.load("/tmp/nn_functional.pkl")
print("checkpoint round-trip OK:",
      float(loss_nn(nn2.params)) == float(loss_nn(nn.params)))

# ---- 3. ground-state training ----------------------------------------------
# target: the WT ground-state energy; trainable: PG, whose ground state is
# RE-OPTIMIZED each epoch and differentiated through via the IFT
E_target = system.energy("Ha")

pg_gs = PauliGaussian()
sys_pg = System(box_vecs, (14, 14, 14), ions,
                [IonIon, IonElectron, Hartree, pg_gs, PerdewBurkeErnzerhof],
                units="a", coord_type="fractional")

print("ground-state energy training (target = WT energy):")
for epoch in range(6):
    # re-converge the density at the current params, then take IFT gradients
    sys_pg.optimize_density(ntol=1e-9, n_maxiter=2000)
    gs_energy = sys_pg.gs_property_fn(pg_gs)
    loss = pg_gs.update_params(
        lambda p: pg_gs.scalar_error(E_target, gs_energy(p)))
    print(f"  epoch {epoch:3d}  loss {float(loss):.3e}  "
          f"E {sys_pg.energy('Ha'):.6f} vs target {E_target:.6f}")
print({k: round(float(v), 4) for k, v in pg_gs.params.items()})
