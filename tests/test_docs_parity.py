"""Reproduce the reference's published documentation numbers end-to-end.

These are the reference's own production-quality results (2000 eV cutoff =
23^3 grid for fcc Al — small enough for CI), quoted in its docs:

* fcc-Al EOS with vWGTF1 + PBE: K0 = 87.821 GPa, K0' = 4.2268,
  E0 = -57.231 eV/atom, V0 = 16.86 A^3/atom
  (reference docs/source/example_elastic.rst:35-38).
* fcc-Al elastic constants with XWM + PBE at V0 ~ 16.56 A^3/atom:
  C11 = 107.08, C12 = 61.215, C44 = 37.861 GPa; K from autodiff 76.502 GPa
  (reference docs/source/example_elastic.rst:163-174).

Tolerances are ~1%: the numbers depend mildly on grid parity/rounding of
``ecut2shape`` and the EOS sampling, but 1% is far tighter than any
physical disagreement.
"""

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, vWGTF1,
                                  XuWangMa, PerdewBurkeErnzerhof)
from professad_tpu.utils.crystal import get_cell
from paths import pot


def test_fcc_al_eos_docs_numbers():
    lv, frac = get_cell("fcc", vol_per_atom=16.8)
    shape = System.ecut2shape(2000, lv)
    ions = [["Al", pot("al.gga.recpot"), frac]]
    terms = [IonIon, IonElectron, Hartree, vWGTF1, PerdewBurkeErnzerhof]
    s = System(lv, shape, ions, terms, units="a", coord_type="fractional")
    params, err = s.eos_fit(f=0.05, N=9, eos="bm", ntol=1e-10,
                            jit_loop=True, precondition=True,
                            n_step_size=1.0)
    K0, K0p, E0, V0 = [float(p) for p in params]
    assert abs(K0 - 87.821) / 87.821 < 0.01, K0
    assert abs(K0p - 4.2268) < 0.1, K0p
    assert abs(E0 - (-57.231)) < 0.01, E0
    assert abs(V0 - 16.86) / 16.86 < 0.005, V0


def test_fcc_al_elastic_constants_docs_numbers():
    lv, frac = get_cell("fcc", vol_per_atom=16.56)
    shape = System.ecut2shape(2000, lv)
    ions = [["Al", pot("al.gga.recpot"), frac]]
    xwm = lambda bv, den: XuWangMa(bv, den, 0.01)
    xwm.__name__ = "XuWangMa"
    terms = [IonIon, IonElectron, Hartree, xwm, PerdewBurkeErnzerhof]
    s = System(lv, shape, ions, terms, units="a", coord_type="fractional")
    s.optimize_density(ntol=1e-10, jit_loop=True, precondition=True,
                       n_step_size=1.0)
    C = np.asarray(s.elastic_constants("GPa"))
    C11 = (C[0, 0] + C[1, 1] + C[2, 2]) / 3
    C12 = (C[0, 1] + C[0, 2] + C[1, 2]) / 3
    C44 = (C[3, 3] + C[4, 4] + C[5, 5]) / 3
    assert abs(C11 - 107.08) / 107.08 < 0.015, C11
    assert abs(C12 - 61.215) / 61.215 < 0.015, C12
    assert abs(C44 - 37.861) / 37.861 < 0.015, C44
    K = float(s.bulk_modulus("GPa"))
    assert abs(K - 76.502) / 76.502 < 0.015, K


def test_al_polymorph_eos_table():
    """The reference's flagship physics demo: the aluminium polymorph
    ordering table — V0 / dE0 / K0 for fcc, hcp, bcc, sc and dc with
    WT + PBE at 2000 eV, Birch-Murnaghan over +-5% x 11 points
    (reference docs/source/example_elastic.rst:81-86; BASELINE.md row 8).
    All values within 1%.
    """
    from professad_tpu.models import WangTeter

    # crystal: (predicted V0 [A^3/atom], ref V0, ref dE0 [meV], ref K0 [GPa])
    ref = {
        "fcc": (16.8, 16.76389, 0.00, 78.80961),
        "hcp": (16.9, 16.87622, 17.78, 77.00603),
        "bcc": (17.2, 17.16419, 72.63, 71.66677),
        "sc": (19.9, 19.88597, 312.48, 57.53359),
        "dc": (28.8, 28.78790, 791.09, 23.52562),
    }
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    results = {}
    for crystal, (pred_v0, *_) in ref.items():
        lv, frac = get_cell(crystal, vol_per_atom=pred_v0, c_over_a=1.66)
        shape = System.ecut2shape(2000, lv)
        ions = [["Al", pot("al.gga.recpot"), frac]]
        s = System(lv, shape, ions, terms, units="a",
                   coord_type="fractional")
        params, err = s.eos_fit(f=0.05, N=11, eos="bm", ntol=1e-7,
                                jit_loop=True, precondition=True,
                                n_step_size=1.0)
        K0, K0p, E0, V0 = [float(p) for p in params]
        results[crystal] = (V0, E0, K0)

    E_fcc = results["fcc"][1]
    for crystal, (_, V0_ref, dE0_ref, K0_ref) in ref.items():
        V0, E0, K0 = results[crystal]
        dE0 = (E0 - E_fcc) * 1e3
        assert abs(V0 - V0_ref) / V0_ref < 0.01, (crystal, V0, V0_ref)
        assert abs(K0 - K0_ref) / K0_ref < 0.01, (crystal, K0, K0_ref)
        # dE0 is a difference of O(57 eV) totals; 1% of the value or
        # 0.5 meV absolute, whichever is looser
        assert abs(dE0 - dE0_ref) <= max(0.01 * abs(dE0_ref), 0.5), \
            (crystal, dE0, dE0_ref)
