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
