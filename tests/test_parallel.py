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


def _fcc_al(shape):
    import os
    from professad_tpu.system import System
    from professad_tpu.models import (IonIon, IonElectron,
                                      PerdewBurkeErnzerhof)
    box_vecs = 4.050 * jnp.eye(3)
    frac = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                        [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    pot = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "potentials", "al.gga.recpot")
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    return System(box_vecs, shape, [["Al", pot, frac]], terms, units="a",
                  coord_type="fractional")


def test_mesh_aware_optimize_density_matches_single_device():
    """System.optimize_density(mesh=...) runs the FULL whole-program
    optimization grid-sharded over 8 devices and lands on the
    single-device energy.  The L-BFGS route now takes the PENCIL generic
    path (its own SPMD trajectory, not a replicated copy of the serial
    program), so the bound is the |dE| stopping rule's landing scatter —
    gradient parity itself is pinned at 1e-12 in
    test_parallel_generic.py."""
    s_ref = _fcc_al((16, 16, 16))
    s_ref.optimize_density(ntol=1e-9, jit_loop=True, precondition=True)
    E_ref = s_ref.energy("eV")

    mesh = _mesh8()
    s_sh = _fcc_al((16, 16, 16))
    s_sh.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                          mesh=mesh)
    assert abs(s_sh.energy("eV") - E_ref) < 1e-7
    # density landing scatter: a 2e-7 density difference costs ~2e-9 eV
    # through the quadratic curvature — both optima, different trajectories
    assert np.allclose(np.asarray(s_sh.density()),
                       np.asarray(s_ref.density()), atol=1e-6)

    # the TPGD fast path shards the same way
    s_t = _fcc_al((16, 16, 16))
    s_t.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                         n_method="TPGD", n_step_size=1.0, skip_iters=2,
                         mesh=mesh)
    assert abs(s_t.energy("eV") - E_ref) < 1e-7


def test_batched_eos_matches_serial():
    """eos_fit(batched=True) — one vmapped whole-optimization program over
    all volume points, data-parallel over the mesh "batch" axis — matches
    the reference-style serial volume scan."""
    from professad_tpu.parallel import make_mesh
    devs = jax.devices("cpu")
    mesh = make_mesh(8, batch=8, devices=devs)  # pure data parallel

    s = _fcc_al((14, 14, 14))
    params_ser, _ = s.eos_fit(f=0.04, N=8, ntol=1e-9)
    s2 = _fcc_al((14, 14, 14))
    params_bat, _ = s2.eos_fit(f=0.04, N=8, ntol=1e-9, batched=True,
                               mesh=mesh)
    # (K0 [GPa], K0', E0 [eV/atom], V0 [A^3/atom])
    assert np.allclose(np.asarray(params_bat), np.asarray(params_ser),
                       rtol=1e-5), (params_bat, params_ser)


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


# --------------------- pencil-decomposed distributed FFT ---------------------

def test_pencil_fft_parity_and_roundtrip():
    """prfftn/pirfftn (shard_map + all_to_all) match jnp.fft exactly."""
    from jax import shard_map
    from professad_tpu.parallel.pfft import prfftn, pirfftn

    mesh = _mesh8()
    shape = (32, 16, 12)
    x = _den(shape, seed=3)

    f = shard_map(prfftn, mesh=mesh, in_specs=P("grid", None, None),
                  out_specs=P(None, "grid", None))
    X = jax.jit(f)(x)
    Xref = jnp.fft.rfftn(x)
    assert float(jnp.max(jnp.abs(X - Xref)) / jnp.max(jnp.abs(Xref))) < 1e-14

    g = shard_map(lambda xl: pirfftn(prfftn(xl), shape), mesh=mesh,
                  in_specs=P("grid", None, None),
                  out_specs=P("grid", None, None))
    assert float(jnp.max(jnp.abs(jax.jit(g)(x) - x))) < 1e-13


def test_pencil_energy_grad_stress_parity():
    """The full distributed WT+PBE energy (parallel.pfft.penergy_wt_pbe):
    energy, density gradient and cell gradient (stress path, fixed-N
    rescale) all match the serial terms at f64 machine precision."""
    from jax import shard_map
    from professad_tpu.parallel.pfft import penergy_wt_pbe
    from professad_tpu.models import (IonElectron, Hartree,
                                      PerdewBurkeErnzerhof)

    mesh = _mesh8()
    shape = (32, 16, 12)
    rng = np.random.default_rng(0)
    den = jnp.asarray(1.0 + 0.3 * rng.random(shape))
    box = jnp.asarray(7.7 * np.eye(3) + 0.2 * rng.standard_normal((3, 3)))
    vext = jnp.asarray(0.1 * rng.standard_normal(shape))

    e_dist = shard_map(
        lambda b, d, v: penergy_wt_pbe(b, d, v, shape), mesh=mesh,
        in_specs=(P(), P("grid", None, None), P("grid", None, None)),
        out_specs=P(), check_vma=False)

    def e_ser(b, d, v):
        return (IonElectron(b, d, v) + Hartree(b, d) + WangTeter(b, d)
                + PerdewBurkeErnzerhof(b, d))

    E_d = float(jax.jit(e_dist)(box, den, vext))
    E_s = float(e_ser(box, den, vext))
    assert abs(E_d - E_s) / abs(E_s) < 1e-13

    gd = np.asarray(jax.jit(jax.grad(e_dist, argnums=1))(box, den, vext))
    gs = np.asarray(jax.grad(e_ser, argnums=1)(box, den, vext))
    assert np.max(np.abs(gd - gs)) / np.max(np.abs(gs)) < 1e-13

    vol0 = float(jnp.abs(jnp.linalg.det(box)))

    def stress_path(e):
        def Eb(b):
            d = den * vol0 / jnp.abs(jnp.linalg.det(b))
            return e(b, d, vext)
        return np.asarray(jax.jit(jax.grad(Eb))(box))

    sd, ss = stress_path(e_dist), stress_path(e_ser)
    assert np.max(np.abs(sd - ss)) / np.max(np.abs(ss)) < 1e-13


def test_pencil_energy_hlo_all_to_all_no_full_gather():
    """The compiled distributed energy+grad program communicates ONLY via
    all-to-all (pencil transposes) and all-reduce (psum means): no
    all-gather at all — in particular no full-grid gather, which is what
    the GSPMD auto-partitioner falls back to for sharded backend FFTs."""
    import re
    from jax import shard_map
    from professad_tpu.parallel.pfft import penergy_wt_pbe
    from professad_tpu.models import IonElectron  # noqa: F401 (docs)

    mesh = _mesh8()
    shape = (32, 16, 12)
    rng = np.random.default_rng(1)
    den = jnp.asarray(1.0 + 0.3 * rng.random(shape))
    box = jnp.asarray(7.7 * np.eye(3))
    vext = jnp.zeros(shape)

    e_dist = shard_map(
        lambda b, d, v: penergy_wt_pbe(b, d, v, shape), mesh=mesh,
        in_specs=(P(), P("grid", None, None), P("grid", None, None)),
        out_specs=P(), check_vma=False)

    den_sh = jax.device_put(den, grid_sharding(mesh))
    txt = (jax.jit(jax.value_and_grad(lambda d: e_dist(box, d, vext)))
           .lower(den_sh).compile().as_text())

    assert txt.count("all-to-all") > 0, "pencil transposes missing"
    assert txt.count("all-reduce") > 0, "psum reductions missing"
    full = int(np.prod(shape))
    for line in txt.splitlines():
        if "all-gather(" in line and "=" in line:
            m = re.search(r'=\s*\S*?\[([\d,]*)\]', line)
            if m and m.group(1):
                size = int(np.prod([int(v) for v in m.group(1).split(",")]))
                assert size < full, f"full-grid all-gather found: {line[:120]}"


def test_vmapped_batched_sharded_fft_probe():
    """Regression probe for the XLA:CPU batched-sharded-FFT limitation
    (fft_thunk.cc IsMonotonicWithDim0Major RET_CHECK) that forces
    __graft_entry__.dryrun_multichip's unrolled fallback.  If this probe
    ever PASSES, the backend has been fixed and the dryrun automatically
    takes the vmapped path (it probes at runtime); this test then documents
    that the workaround is obsolete."""
    devs = jax.devices("cpu")
    mesh = make_mesh(8, batch=2, devices=devs)
    shape = (16, 12, 12)
    box = 7.7 * jnp.eye(3)
    den_b = jnp.asarray(1.0 + 0.3 * np.random.default_rng(0).random(
        (2,) + shape))
    sh = NamedSharding(mesh, P("batch", "grid"))
    den_b = jax.device_put(den_b, sh)
    f = jax.jit(jax.vmap(jax.value_and_grad(WangTeter, argnums=1),
                         in_axes=(None, 0)), in_shardings=(None, sh))
    try:
        out = f(box, den_b)
        jax.block_until_ready(out)
        worked = True
    except Exception as e:
        worked = False
        msg = str(e)
        assert "fft" in msg.lower() or "Monotonic" in msg, \
            f"vmapped sharded FFT failed with an UNEXPECTED error: {msg[:200]}"
    if worked:
        # backend fixed: parity must hold lane-by-lane
        ref0 = float(WangTeter(box, den_b[0]))
        assert np.isclose(float(out[0][0]), ref0, rtol=1e-10)


def test_pencil_whole_optimization_matches_single_device():
    """The PRODUCTION distributed solver — pencil FFTs + fused analytic
    potentials + psum'd BB iterations, the whole optimization as one SPMD
    program (optimize_density(mesh=..., analytic=True, n_method='TPGD'))
    — lands on the single-device ground state, and its compiled HLO has
    all-to-all/psum and NO all-gather at all."""
    import re
    from professad_tpu.system import System
    from professad_tpu.models import (IonIon, IonElectron, Hartree,
                                      PerdewBurkeErnzerhof)
    from professad_tpu.parallel.pfft import pencil_tpgd_minimize
    from paths import pot

    box_vecs = 4.05 * jnp.asarray([[0.5, 0.5, 0.0],
                                   [0.0, 0.5, 0.5],
                                   [0.5, 0.0, 0.5]])
    ions = [["Al", pot("al.gga.recpot"), jnp.zeros((1, 3))]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    shape = (16, 16, 16)

    s_ref = System(box_vecs, shape, ions, terms, units="a",
                   coord_type="fractional")
    s_ref.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                           n_step_size=1.0, n_method="TPGD", skip_iters=2,
                           analytic=True)
    E_ref = s_ref.energy("eV")

    mesh = _mesh8()
    s_d = System(box_vecs, shape, ions, terms, units="a",
                 coord_type="fractional")
    s_d.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                         n_step_size=1.0, n_method="TPGD", skip_iters=2,
                         analytic=True, mesh=mesh)
    assert abs(s_d.energy("eV") - E_ref) < 1e-9, (s_d.energy("eV"), E_ref)

    # HLO of the full solve: collectives yes, gathers no
    s_h = System(box_vecs, shape, ions, terms, units="a",
                 coord_type="fractional")
    chi0 = jnp.sqrt(s_h.density()).reshape(-1)
    M = jax.jit(s_h._exact_precond_kernel)(s_h._box_vecs,
                                           float(s_h._N_elec))
    # reproduce pencil_tpgd_minimize's program and inspect it
    from jax.sharding import NamedSharding
    from professad_tpu.parallel import pfft as _pf
    from professad_tpu.ops import solvers as _sol
    from jax import shard_map

    def body(chi_local, box, vext_local, M_slab):
        n_dev = jax.lax.axis_size("grid")
        local_shape = (shape[0] // n_dev, shape[1], shape[2])
        vg = lambda x: _pf.pchi_value_and_grad(x, box, vext_local,
                                               float(s_h._N_elec), shape)
        def aH0(q):
            X = _pf.prfftn(q.reshape(local_shape))
            return _pf.pirfftn(M_slab * X, shape).reshape(q.shape)
        return _sol.tpgd_minimize(vg, chi_local, lr=1.0, ntol=1e-9,
                                  max_iter=50, apply_H0=aH0, skip_iters=2,
                                  axis_name="grid")

    st_specs = _sol.TPGDState(x=P("grid"), f=P(), g=P("grid"),
                              g_prev=P("grid"),
                              Mg_prev=P("grid"), s_prev=P("grid"), n_iter=P())
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P("grid"), P(), P("grid", None, None),
                             P(None, "grid", None)),
                   out_specs=(st_specs, P(), P()), check_vma=False)
    chi_sh = jax.device_put(chi0, NamedSharding(mesh, P("grid")))
    v_sh = jax.device_put(s_h._v_ext,
                          NamedSharding(mesh, P("grid", None, None)))
    M_sh = jax.device_put(M, NamedSharding(mesh, P(None, "grid", None)))
    txt = (jax.jit(fn).lower(chi_sh, s_h._box_vecs, v_sh, M_sh)
           .compile().as_text())
    assert txt.count("all-to-all") > 0
    assert txt.count("all-reduce") > 0
    assert "all-gather(" not in txt, "distributed solve must not gather"


def test_pencil_lbfgs_matches_single_device():
    """The distributed L-BFGS (psum'd two-loop recursion) — the f64 tier's
    preferred solver — through the pencil pipeline."""
    from professad_tpu.system import System
    from professad_tpu.models import (IonIon, IonElectron, Hartree,
                                      PerdewBurkeErnzerhof)
    from professad_tpu.parallel.pfft import pencil_tpgd_minimize
    from paths import pot

    box_vecs = 4.05 * jnp.asarray([[0.5, 0.5, 0.0],
                                   [0.0, 0.5, 0.5],
                                   [0.5, 0.0, 0.5]])
    ions = [["Al", pot("al.gga.recpot"), jnp.zeros((1, 3))]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    shape = (16, 16, 16)
    s_ref = System(box_vecs, shape, ions, terms, units="a",
                   coord_type="fractional")
    s_ref.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                           n_step_size=1.0, analytic=True)
    E_ref = s_ref.energy("eV")

    mesh = _mesh8()
    s_d = System(box_vecs, shape, ions, terms, units="a",
                 coord_type="fractional")
    chi0 = jnp.sqrt(s_d.density()).reshape(-1)
    M = jax.jit(s_d._exact_precond_kernel)(s_d._box_vecs,
                                           float(s_d._N_elec))
    st, it, conv = pencil_tpgd_minimize(
        mesh, shape, s_d._box_vecs, s_d._v_ext, float(s_d._N_elec), chi0,
        M, lr=1.0, ntol=1e-9, max_iter=500, method="LBFGS")
    assert bool(conv)
    s_d._set_den_from_chi(jnp.asarray(st.x))
    s_d._ene = s_d._compute_energy(use_ion_cache=s_d._Eion_cache is not None)
    assert abs(s_d.energy("eV") - E_ref) < 1e-9


def test_pencil_rejects_indivisible_shapes():
    from professad_tpu.parallel.pfft import pencil_tpgd_minimize
    import pytest

    mesh = _mesh8()
    with pytest.raises(ValueError, match="divisible"):
        pencil_tpgd_minimize(mesh, (12, 16, 16), jnp.eye(3),
                             jnp.zeros((12, 16, 16)), 4.0,
                             jnp.ones(12 * 16 * 16),
                             jnp.ones((12, 2, 9)))
