"""f32 fast-path accuracy bounds vs the f64 correctness tier.

The TPU tier runs f32 end to end (no f64 FFT on TPU); these tests pin down
what that costs, per observable, at the preconditioned-TPGD fixed point
(the bench configuration).  Measured values this round (CPU f32, which
matches TPU once FFTs go through ops.tpufft):

* fcc-Al 48^3 WT+PBE:  |dE| = 1.4 ueV/atom,  max|dsigma| = 1.6e-4 eV/A^3
* triclinic Li2 SM+PBE 24^3:  max|dF| = 8e-7 eV/A

All far below the reference's own tolerances (golden energies atol 1e-4 eV;
geometry defaults ftol 0.02 eV/A, stol 0.002 eV/A^3), i.e. the f32 tier is
accurate enough for production geometry/EOS work.  The asserted bounds
leave ~10x headroom for platform-to-platform FFT rounding differences.
"""

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  SmargiassiMadden, PerdewBurkeErnzerhof)
from paths import pot

EV = 27.211386245988


def _f32_fixed_point(system):
    """Run the f32 fast path (exact-preconditioned TPGD, jit_loop) on a
    cast copy of the system's state; returns (E_total_eV, system mutated to
    the f32 state for follow-up force/stress evaluation)."""
    chi0 = jnp.sqrt(system.density()).astype(jnp.float32).reshape(-1)
    bv32 = system._box_vecs.astype(jnp.float32)
    vx32 = system._v_ext.astype(jnp.float32)
    st, n_it, conv = system._jit_tpgd_full(
        chi0, bv32, vx32, float(system._N_elec), 1.0, 1e-7, 3, 1000,
        conv_target="dE", precondition=True, skip_iters=2)
    assert bool(conv), int(n_it)
    E = (float(st.f) + float(system._compute_energy()
                             - system._compute_energy(for_den_opt=True)))
    chi = st.x.reshape(system._shape)
    N_tilde = jnp.mean(chi * chi) * system.volume("b3")
    system._den = (system._N_elec / N_tilde) * chi * chi
    system._box_vecs = bv32
    system._v_ext = vx32
    system._charges = system._charges.astype(jnp.float32)
    system._frac_ion_coords = system._frac_ion_coords.astype(jnp.float32)
    return E * EV


def test_f32_energy_and_stress_bounds_fcc_al():
    box_vecs = 4.050 * jnp.eye(3)
    frac = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                        [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]

    s64 = System(box_vecs, (48, 48, 48), [["Al", pot("al.gga.recpot"), frac]],
                 terms, units="a", coord_type="fractional")
    s64.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                         n_step_size=1.0)
    E64 = s64.energy("eV") / 4
    S64 = np.asarray(s64.stress("eV/a3"))

    s32 = System(box_vecs, (48, 48, 48), [["Al", pot("al.gga.recpot"), frac]],
                 terms, units="a", coord_type="fractional")
    E32 = _f32_fixed_point(s32) / 4
    S32 = np.asarray(s32.stress("eV/a3"))

    assert abs(E32 - E64) < 2e-5, abs(E32 - E64)             # measured 1.4e-6
    assert np.max(np.abs(S32 - S64)) < 1e-3, \
        np.max(np.abs(S32 - S64))                            # measured 1.6e-4


def test_wmean_beats_naive_3d_reduction():
    """wmean (column-sum + f64 combine, cast back to f32) holds ~1-ulp
    accuracy regardless of array shape.  Motivation: XLA compiles 3-D and
    flat f32 full reductions to DIFFERENT summation orders (measured -4e-7
    vs +6e-8 relative on the same 48^3 field on XLA:CPU); a 3e-6-relative
    N_tilde error rescales the density and shifts the energy by
    mu*N*rho ~ 1e-5 Ha, which dominated every other f32 error source."""
    from professad_tpu.ops.grid import wmean
    import jax

    rng = np.random.default_rng(3)
    x64 = 0.0296 * (1.0 + 0.3 * rng.standard_normal((48, 48, 48)))
    x32 = jnp.asarray(x64, jnp.float32)
    m64 = float(np.mean(x64))
    for xs in (x32, x32.reshape(-1)):
        m = float(jax.jit(wmean)(xs))
        assert abs(m - m64) / m64 < 1.5e-7, abs(m - m64) / m64
    # the tangent rule is linear and composes with second-order autodiff
    g = jax.grad(lambda a: wmean(a * a))(x32)
    assert np.allclose(np.asarray(g), 2.0 * np.asarray(x32) / x32.size,
                       rtol=1e-6)
    hvp = jax.jvp(jax.grad(lambda a: wmean(a * a)), (x32,),
                  (jnp.ones_like(x32),))[1]
    assert np.allclose(np.asarray(hvp), 2.0 / x32.size, rtol=1e-6)
    assert m64 != 0.0


def test_f32_fft_dc_split_exact_on_uniform_fields():
    """The DC-split f32 rfftn/irfftn carry k=0 around the backend
    transform: a uniform field transforms to EXACT zeros off-DC (no DC
    leak) and round-trips exactly.  This is what makes the preconditioner
    HVP and whole-optimization trajectories run-to-run deterministic on
    TPU (the backend FFT's leak pattern varies between compiled
    programs)."""
    from professad_tpu.ops.grid import rfftn, irfftn
    import jax

    c = jnp.float32(0.0296)
    x = jnp.full((24, 24, 24), c, dtype=jnp.float32)
    X = jax.jit(rfftn)(x)
    X = np.array(X)  # writable copy
    assert X[0, 0, 0] == np.float32(c) * x.size
    X[0, 0, 0] = 0.0
    assert np.all(X == 0.0), np.max(np.abs(X))
    y = np.asarray(jax.jit(lambda v: irfftn(rfftn(v), v.shape))(x))
    assert np.all(y == np.float32(c)), np.max(np.abs(y - float(c)))


def test_f32_force_bounds_triclinic_li2():
    box_li = jnp.asarray([[3.5, 0.0, 0.0],
                          [0.4, 3.2, 0.0],
                          [-0.3, 0.2, 3.6]])
    frac_li = jnp.asarray([[0.05, 0.1, 0.0], [0.55, 0.4, 0.55]])
    terms = [IonIon, IonElectron, Hartree, SmargiassiMadden,
             PerdewBurkeErnzerhof]

    s64 = System(box_li, (24, 24, 24), [["Li", pot("li.gga.recpot"), frac_li]],
                 terms, units="a", coord_type="fractional")
    s64.optimize_density(ntol=1e-9, jit_loop=True, precondition=True,
                         n_step_size=1.0)
    F64 = np.asarray(s64.forces("eV/a"))

    s32 = System(box_li, (24, 24, 24), [["Li", pot("li.gga.recpot"), frac_li]],
                 terms, units="a", coord_type="fractional")
    _f32_fixed_point(s32)
    F32 = np.asarray(s32.forces("eV/a"))

    assert np.max(np.abs(F32 - F64)) < 1e-4, np.max(np.abs(F32 - F64))
