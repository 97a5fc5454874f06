"""Distributed property surface: forces / stress / geometry through the
pencil-FFT layer (round-3 VERDICT missing #1).

With a mesh attached (``System.set_mesh`` or ``optimize_density(mesh=...)``)
the whole derivative surface of the reference — forces, stress, geometry
relaxation — evaluates as shard_map programs over the "grid" axis: v_ext is
rebuilt per-slab from the exact structure factor on each device's k-pencil,
the term bodies run under ``ops.grid.pencil_mode``, and only the replicated
(N_ions x 3) / (3 x 3) gradients leave the mesh.  Parity with the serial
implementations at f64 machine precision on the 8-device virtual CPU mesh.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.parallel import make_mesh
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  vWGTF1, PerdewBurkeErnzerhof)
from paths import pot


def _mesh8():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return make_mesh(8, batch=1, devices=devs)


def _li2_system(terms=None, shape=(16, 16, 16), pme_order=None):
    """Li2 with one ion displaced off the symmetric site: nonzero forces
    and an anisotropic stress."""
    box_len = 6.96
    box_vecs = box_len * jnp.eye(3)
    ions = [["Li", pot("li.gga.recpot"),
             box_len * jnp.asarray([[0.02, 0.05, 0.0], [0.5, 0.5, 0.47]])]]
    if terms is None:
        terms = [IonIon, IonElectron, Hartree, WangTeter,
                 PerdewBurkeErnzerhof]
    return System(box_vecs, shape, ions, terms, units="b",
                  pme_order=pme_order)


def test_forces_mesh_parity():
    s = _li2_system()
    s.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                       n_step_size=1.0, n_method="TPGD", skip_iters=2)
    F_ser = np.asarray(s.forces())
    assert np.max(np.abs(F_ser)) > 1e-4  # displaced ions: real forces

    s.set_mesh(_mesh8())
    F_par = np.asarray(s.forces())
    assert np.max(np.abs(F_par - F_ser)) / np.max(np.abs(F_ser)) < 1e-10


def test_stress_mesh_parity():
    s = _li2_system()
    s.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                       n_step_size=1.0, n_method="TPGD", skip_iters=2)
    sig_ser = np.asarray(s.stress())

    s.set_mesh(_mesh8())
    sig_par = np.asarray(s.stress())
    assert np.max(np.abs(sig_par - sig_ser)) / np.max(np.abs(sig_ser)) < 1e-10
    # pressure identity survives distribution
    P_par = -np.trace(sig_par) / 3.0
    P_ser = -np.trace(sig_ser) / 3.0
    assert abs(P_par - P_ser) < 1e-12 * max(1.0, abs(P_ser))


def test_stress_mesh_parity_generic_terms():
    """A non-WT term set (vWGTF1+PBE) through the distributed stress —
    the generic pencil_mode dispatch, not a hand-written body."""
    terms = [IonIon, IonElectron, Hartree, vWGTF1, PerdewBurkeErnzerhof]
    s = _li2_system(terms=terms)
    s.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                       n_step_size=1.0, n_method="TPGD", skip_iters=2)
    sig_ser = np.asarray(s.stress())
    s.set_mesh(_mesh8())
    sig_par = np.asarray(s.stress())
    assert np.max(np.abs(sig_par - sig_ser)) / np.max(np.abs(sig_ser)) < 1e-10


def test_energy_assembly_mesh_parity():
    """System.energy() with a mesh attached routes through the distributed
    term sum (no full-grid gathers) and matches the serial assembly."""
    s = _li2_system()
    s.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                       n_step_size=1.0, n_method="TPGD", skip_iters=2)
    E_ser = s.energy("eV")
    s.set_mesh(_mesh8())
    s._ene = s._compute_energy()
    assert abs(s.energy("eV") - E_ser) < 1e-10 * abs(E_ser)


def test_optimize_density_attaches_mesh():
    """optimize_density(mesh=...) attaches the mesh, so the follow-on
    forces/stress are distributed automatically; set_mesh(None) detaches."""
    s = _li2_system()
    mesh = _mesh8()
    s.optimize_density(ntol=1e-9, jit_loop=True, n_step_size=1.0,
                       n_method="TPGD", skip_iters=2, mesh=mesh,
                       analytic=False)
    assert s._mesh is mesh
    F_par = np.asarray(s.forces())
    s.set_mesh(None)
    F_ser = np.asarray(s.forces())
    assert np.max(np.abs(F_par - F_ser)) / np.max(np.abs(F_ser)) < 1e-10


def test_geometry_relaxation_mesh_smoke():
    """One geometry relaxation through mesh= end to end: the distributed
    geometry gradient, distributed per-step density re-optimization, and
    distributed force convergence checks relax the displaced Li2 to a
    real force minimum — CROSS-VALIDATED by detaching the mesh and
    re-measuring the final forces with the serial engine."""
    ftol = 0.02
    s_par = _li2_system(shape=(16, 16, 16))
    ok = s_par.optimize_geometry(ftol=ftol, stol=None, g_maxiter=60,
                                 ntol=1e-8, jit_loop=True,
                                 n_step_size=1.0, n_method="TPGD",
                                 skip_iters=2, mesh=_mesh8(),
                                 analytic=False)
    assert ok, "distributed relaxation did not converge"
    F_par = np.asarray(s_par.forces("eV/a"))
    assert np.max(np.abs(F_par)) < ftol
    # serial cross-check of the distributed convergence claim
    s_par.set_mesh(None)
    F_ser = np.asarray(s_par.forces("eV/a"))
    assert np.max(np.abs(F_par - F_ser)) < 1e-9
    assert np.max(np.abs(F_ser)) < ftol


def test_mesh_pme_forces_parity():
    """Distributed PME: the B-spline spread runs as a zero-communication
    masked slab scatter (each device keeps its own rows of the replicated
    stencil), the deconvolution on the k-pencil indices.  Forces through
    the PME v_ext rebuild must match the serial PME path to roundoff."""
    s = _li2_system(pme_order=8)
    s.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                       n_step_size=1.0, n_method="TPGD", skip_iters=2)
    F_ser = np.asarray(s.forces())
    assert np.max(np.abs(F_ser)) > 1e-4

    s.set_mesh(_mesh8())
    F_par = np.asarray(s.forces())
    assert np.max(np.abs(F_par - F_ser)) / np.max(np.abs(F_ser)) < 1e-10


def test_mesh_pme_stress_parity():
    """Distributed stress through the PME structure factor (the v_ext
    rebuild differentiates through the masked slab spread and the pencil
    wavevecs)."""
    s = _li2_system(pme_order=8)
    s.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                       n_step_size=1.0, n_method="TPGD", skip_iters=2)
    sig_ser = np.asarray(s.stress())

    s.set_mesh(_mesh8())
    sig_par = np.asarray(s.stress())
    assert (np.max(np.abs(sig_par - sig_ser))
            / np.max(np.abs(sig_ser))) < 1e-10


def test_parameterized_geometry_mesh_parity():
    """optimize_parameterized_geometry with a set_mesh-attached mesh: the
    parameter gradient evaluates through the distributed chi-energy body
    (``_mesh_chi_energy_body``) and the per-step density re-optimizations
    are routed onto the pencil solver automatically.

    Parity is checked on ONE fixed TPGD step (p1 = p0 - lr * dE/dp, a
    deterministic function of the parameter gradient): multi-step BB
    trajectories divide by tiny gradient differences and amplify
    density-convergence noise chaotically, so they are not a correctness
    property (measured: two engines both converged to ntol=1e-9 diverge
    by 0.14 in p after two BB steps while their gradients agree to
    1e-15)."""
    def geom(p):
        box = p[0] * jnp.eye(3)
        frac = jnp.asarray([[0.02, 0.05, 0.0], [0.5, 0.5, 0.47]])
        return box, frac

    kw = dict(ftol=None, stol=1e-5, g_maxiter=1, g_method="TPGD",
              g_step_size=0.05, ntol=1e-9, jit_loop=True,
              n_step_size=1.0, n_method="TPGD", skip_iters=2)

    s_ser = _li2_system()
    _, p_ser = s_ser.optimize_parameterized_geometry(
        jnp.asarray([6.96]), geom, **kw)

    s_par = _li2_system()
    s_par.set_mesh(_mesh8())
    _, p_par = s_par.optimize_parameterized_geometry(
        jnp.asarray([6.96]), geom, **kw)
    assert s_par._mesh is not None

    # one step from the same start: dp = lr * (g_ser - g_par) exactly
    assert np.max(np.abs(np.asarray(p_par) - np.asarray(p_ser))) < 1e-9
