"""Multi-chip scaling demo: slab-decomposed density optimization.

The 3-D real-space grid is sharded along its first axis over a device mesh
(``professad_tpu.parallel``); XLA's SPMD partitioner inserts the all-to-all
FFT transposes and psum energy reductions over ICI.  On a CPU host, run with

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip_sharding.py

to emulate an 8-chip mesh.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run


import numpy as np
import jax
import jax.numpy as jnp

from professad_tpu.parallel import make_mesh, flat_sharding
from professad_tpu.models import Hartree, ThomasFermi, Weizsaecker, WangTeter
from professad_tpu.ops import solvers

devs = jax.devices()
if len(devs) < 2:
    devs = jax.devices("cpu")  # emulated mesh (xla_force_host_platform_device_count)
dtype = jnp.float64 if devs[0].platform == "cpu" else jnp.float32
mesh = make_mesh(len(devs), batch=1, devices=devs)
print(f"mesh: {mesh}")

shape = (8 * mesh.shape["grid"], 32, 32)
box_vecs = jnp.asarray(12.0 * np.eye(3), dtype)
N_elec = 16.0
vol = float(abs(np.linalg.det(np.asarray(box_vecs))))

rng = np.random.default_rng(0)
den0 = jnp.asarray((1.0 + 0.2 * rng.random(shape)) * (N_elec / vol), dtype)


def chi_energy(chi_flat):
    chi = chi_flat.reshape(shape)
    N_tilde = jnp.mean(chi * chi) * vol
    den = (N_elec / N_tilde) * chi * chi
    return (ThomasFermi(box_vecs, den) + Weizsaecker(box_vecs, den)
            + Hartree(box_vecs, den))


vg = jax.value_and_grad(chi_energy)
chi0 = jax.device_put(jnp.sqrt(den0).reshape(-1), flat_sharding(mesh))


@jax.jit
def optimize(chi_flat):
    st, n_it, conv = solvers.lbfgs_minimize(vg, chi_flat, lr=0.1, ntol=1e-9,
                                            conv_count=3, max_iter=200)
    return st.f, n_it, conv


E, n_it, conv = optimize(chi0)
print(f"sharded density optimization: E = {float(E):.8f} Ha in "
      f"{int(n_it)} iterations (converged={bool(conv)})")

# ---- the same thing at the System level ------------------------------------
# optimize_density(mesh=...) shards chi and v_ext over the mesh's "grid"
# axis; GSPMD partitions the entire while_loop program.  (Real systems with
# pseudopotentials work identically — this uses the library API end to end.)
from professad_tpu.system import System
from professad_tpu.models import IonIon, IonElectron, PerdewBurkeErnzerhof

POT = os.path.join(os.path.dirname(__file__), "..", "tests", "potentials",
                   "al.gga.recpot")
box_A = 4.050 * jnp.eye(3)
frac = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                    [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
n0 = 2 * mesh.shape["grid"]
sys_ = System(box_A, (n0, 16, 16), [["Al", POT, frac]],
              [IonIon, IonElectron, Hartree, WangTeter,
               PerdewBurkeErnzerhof], units="a", coord_type="fractional")
# analytic=True + TPGD + mesh selects the PRODUCTION distributed solver:
# hand-written pencil FFTs (one all_to_all per transform) + fused analytic
# potentials + psum'd BB iterations — the compiled program contains no
# all-gathers (parallel/pfft.py; the GSPMD fallback for other term sets
# gathers the grid per FFT because XLA cannot partition FFT ops).
sys_.optimize_density(ntol=1e-8, jit_loop=True, n_method="TPGD",
                      n_step_size=1.0, precondition=True, skip_iters=2,
                      mesh=mesh, analytic=True)
print(f"System-level distributed optimize_density (pencil FFT): "
      f"E = {sys_.energy('eV'):.6f} eV")

# ---- generic distributed functionals ----------------------------------------
# Any functional set distributes: under ops.grid.pencil_mode the SERIAL
# term bodies run inside shard_map (rfftn/irfftn/wavevecs/means redirect
# to pencil implementations), so analytic=False routes arbitrary term
# sets — including prepared ladder terms (HC family) — through the same
# zero-gather pencil solver.
from professad_tpu.models import vWGTF1
sys_g = System(box_A, (n0, 16, 16), [["Al", POT, frac]],
               [IonIon, IonElectron, Hartree, vWGTF1,
                PerdewBurkeErnzerhof], units="a", coord_type="fractional")
sys_g.optimize_density(ntol=1e-8, jit_loop=True, n_method="TPGD",
                       n_step_size=1.0, precondition=True, skip_iters=2,
                       mesh=mesh, analytic=False)
print(f"System-level distributed optimize_density (generic, vWGTF1+PBE): "
      f"E = {sys_g.energy('eV'):.6f} eV")
