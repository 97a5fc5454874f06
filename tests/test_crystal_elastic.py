"""Unit tests for the L4 convenience layer: crystal generators and
elastic/EOS post-processing (parity targets:
/root/reference/src/professad/crystal_tools.py, elastic_tools.py)."""

import numpy as np
import pytest

from professad_tpu.utils.crystal import get_cell
from professad_tpu.utils.elastic import (fit_eos, voigt_moduli, reuss_moduli,
                                         shear_average, poissons_ratio,
                                         youngs_modulus)


@pytest.mark.parametrize("crystal,n_ions", [
    ("sc", 1), ("bcc", 1), ("bcc-c", 2), ("fcc", 1), ("fcc-c", 4),
    ("dc", 2), ("dc-c", 8), ("hcp", 2),
])
def test_get_cell_volume_per_atom(crystal, n_ions):
    vpa = 16.8
    lv, fc = get_cell(crystal, vol_per_atom=vpa)
    assert fc.shape == (n_ions, 3)
    vol = abs(np.linalg.det(np.asarray(lv)))
    assert np.isclose(vol / n_ions, vpa, rtol=1e-12)
    # fractional coordinates lie in [0, 1)
    assert np.all(np.asarray(fc) >= 0.0) and np.all(np.asarray(fc) < 1.0)


def test_get_cell_cartesian_coords():
    lv, cart = get_cell("fcc-c", 16.8, coord_type="cartesian")
    lv2, fc = get_cell("fcc-c", 16.8, coord_type="fractional")
    assert np.allclose(np.asarray(cart), np.asarray(fc) @ np.asarray(lv2))


@pytest.mark.parametrize("eos", ["m", "bm"])
def test_fit_eos_recovers_parameters(eos):
    """Generate synthetic EOS data from known (K0, K0', E0, V0) and check the
    fit recovers them (internal cross-validation, SURVEY.md section 4 tier 4)."""
    K0, K0p, E0, V0 = 0.05, 4.2, -57.0, 16.8  # eV/A^3, -, eV, A^3
    vs = np.linspace(0.9 * V0, 1.1 * V0, 15)

    if eos == "m":
        es = (E0 + (K0 * vs / K0p) * ((((V0 / vs) ** K0p) / (K0p - 1)) + 1)
              - K0 * V0 / (K0p - 1))
    else:
        x = (V0 / vs) ** (2.0 / 3.0) - 1.0
        es = E0 + 9 * V0 * K0 / 16 * (K0p * x**3
                                      + x**2 * (6 - 4 * (V0 / vs) ** (2.0 / 3.0)))

    params, err = fit_eos(vs, es, eos=eos)
    assert np.allclose(params, [K0, K0p, E0, V0], rtol=1e-6)


def test_isotropic_moduli_identities():
    """For an isotropic elastic tensor, Voigt == Reuss == true (K, G), and the
    Poisson/Young formulas reduce to textbook identities."""
    K, G = 76.0, 30.0
    C11 = K + 4.0 * G / 3.0
    C12 = K - 2.0 * G / 3.0
    C = np.zeros((6, 6))
    C[:3, :3] = C12
    np.fill_diagonal(C[:3, :3], C11)
    C[3, 3] = C[4, 4] = C[5, 5] = G

    Kv, Gv = voigt_moduli(C)
    Kr, Gr = reuss_moduli(C)
    assert np.isclose(float(Kv), K) and np.isclose(float(Gv), G)
    assert np.isclose(float(Kr), K) and np.isclose(float(Gr), G)
    assert np.isclose(float(shear_average(C)), G)
    assert np.isclose(float(shear_average(C, "geometric")), G)

    nu = poissons_ratio(K, G)
    E = youngs_modulus(K, G)
    assert np.isclose(E, 2.0 * G * (1.0 + nu))   # E = 2G(1+nu)
    assert np.isclose(E, 3.0 * K * (1.0 - 2.0 * nu))  # E = 3K(1-2nu)
