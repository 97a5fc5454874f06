"""Multi-device sharding tests on the 8-way virtual CPU mesh.

The reference has no distributed path (SURVEY.md section 2.7); these tests
validate the TPU-native scaling design instead: slab-decomposed 3-D grids
under GSPMD, with energies/gradients bitwise-consistent with the
single-device path to float64 tolerances.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from professad_tpu.parallel import (make_mesh, grid_sharding, flat_sharding,
                                    auto_mesh_shape)
from professad_tpu.models import Hartree, ThomasFermi, Weizsaecker, WangTeter
from professad_tpu.ops import solvers


def _mesh8():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return make_mesh(8, batch=1, devices=devs)


def _den(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(1.0 + 0.3 * rng.random(shape))


def test_auto_mesh_shape():
    assert auto_mesh_shape(8, 1) == (1, 8)
    assert auto_mesh_shape(8, 2) == (2, 4)
    try:
        auto_mesh_shape(8, 3)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_sharded_energy_matches_single_device():
    """Energies evaluated on a slab-sharded grid equal the unsharded values:
    GSPMD's FFT partitioning + psum reductions are numerically transparent."""
    mesh = _mesh8()
    shape = (32, 12, 12)
    box_vecs = 7.7 * jnp.eye(3)
    den = _den(shape)

    for term in (ThomasFermi, Weizsaecker, Hartree, WangTeter):
        E_ref = float(term(box_vecs, den))
        den_sh = jax.device_put(den, grid_sharding(mesh))
        E_sh = float(jax.jit(term)(box_vecs, den_sh))
        assert np.isclose(E_sh, E_ref, rtol=1e-12), term.__name__


def test_sharded_gradient_matches_single_device():
    mesh = _mesh8()
    shape = (32, 12, 12)
    box_vecs = 7.7 * jnp.eye(3)
    den = _den(shape, seed=1)

    g_ref = jax.grad(WangTeter, argnums=1)(box_vecs, den)
    den_sh = jax.device_put(den, grid_sharding(mesh))
    g_sh = jax.jit(jax.grad(WangTeter, argnums=1))(box_vecs, den_sh)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-12)


def test_sharded_lbfgs_step_matches_single_device():
    """One jitted L-BFGS outer step (6 iterations) on a grid-sharded flat chi
    equals the single-device result."""
    mesh = _mesh8()
    shape = (32, 12, 12)
    box_vecs = 7.7 * jnp.eye(3)
    den = _den(shape, seed=2)
    N_elec = 8.0
    vol = float(jnp.abs(jnp.linalg.det(box_vecs)))

    def chi_energy(chi_flat):
        chi = chi_flat.reshape(shape)
        N_tilde = jnp.mean(chi * chi) * vol
        d = (N_elec / N_tilde) * chi * chi
        return ThomasFermi(box_vecs, d) + Weizsaecker(box_vecs, d)

    vg = jax.value_and_grad(chi_energy)
    chi0 = jnp.sqrt(den).reshape(-1)

    st = solvers.lbfgs_init(vg, chi0)
    st_ref = solvers.lbfgs_iterations(vg, st, 6, 0.1)

    fsh = flat_sharding(mesh)
    chi0_sh = jax.device_put(chi0, fsh)

    @jax.jit
    def step(chi_flat):
        s = solvers.lbfgs_init(vg, chi_flat)
        return solvers.lbfgs_iterations(vg, s, 6, 0.1)

    st_sh = step(chi0_sh)
    assert np.allclose(np.asarray(st_sh.x), np.asarray(st_ref.x), atol=1e-12)
    assert np.isclose(float(st_sh.f), float(st_ref.f), rtol=1e-12)
