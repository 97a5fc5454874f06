"""PME structure factor: B-spline basis vs scipy, deconvolution identity,
exact-vs-spline S(q), and end-to-end equality of density/energy/forces/stress
(parity: /root/reference/tests/test_particle_mesh_ewald.py)."""

import numpy as np
import jax.numpy as jnp
from scipy.interpolate import BSpline

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  PerdewBurkeErnzerhof)
from professad_tpu.models.ions import (cardinal_b_spline_values,
                                       exponential_spline_b,
                                       structure_factor,
                                       structure_factor_spline)
from paths import pot


def test1_cardinal_b_spline_values():
    m = 11
    for n in range(2, 31):
        p = n - 1
        spl = np.zeros(m * n)
        i_over_m = jnp.arange(m, dtype=jnp.float64) / m
        array = np.asarray(cardinal_b_spline_values(i_over_m, n))
        for i in range(m):
            for j in range(n):
                spl[i + j * m] = array[j, i]
        x = np.linspace(0, n, m * n, endpoint=False)
        knots = np.arange(-(p + 1) / 2, (p + 3) / 2)
        out = BSpline.basis_element(knots)(x - (p + 1) / 2)
        out[(x - (p + 1) / 2 < knots[0]) | (x - (p + 1) / 2 > knots[-1])] = 0.0
        assert np.allclose(spl, out)


def test2_exponential_spline_b():
    order = 20
    m = 3
    N = 9
    x = np.linspace(0, 8, 20, endpoint=False)
    f = np.exp(1j * 2 * np.pi * m / N * x)
    s = np.zeros(x.size, dtype=complex)
    for i in range(x.size):
        for k in range(-50, 50):
            if x[i] - k <= 0 or x[i] - k >= order:
                continue
            M = cardinal_b_spline_values(
                jnp.asarray([x[i] - k - np.floor(x[i] - k)]), order)
            s[i] += float(M[int(np.floor(x[i] - k))][0]) \
                * np.exp(1j * 2 * np.pi * m / N * k)
    s *= np.asarray(exponential_spline_b(jnp.asarray([float(m)]), N, order))
    assert np.allclose(f, s)


def test3_structure_factors():
    shape = (35, 36, 37)
    box_vecs = jnp.asarray([[4.9, 0.1, 0.2],
                            [-0.2, 5.0, 0.3],
                            [0.3, -0.1, 5.1]])
    cart = jnp.asarray([[0.0, 0.0, 0.0],
                        [2.0, 0.1, 0.2],
                        [0.3, 1.0, 2.0]])
    sf = np.asarray(structure_factor(box_vecs, shape, cart))
    sf_spline = np.asarray(structure_factor_spline(box_vecs, shape, cart, 20))
    t = 10
    assert np.allclose(sf[:t, :t, :t], sf_spline[:t, :t, :t])
    assert np.allclose(sf[:t, -t:, :t], sf_spline[:t, -t:, :t])
    assert np.allclose(sf[-t:, :t, :t], sf_spline[-t:, :t, :t])
    assert np.allclose(sf[-t:, -t:, :t], sf_spline[-t:, -t:, :t])


def test4_pme_den_force_stress():
    shape = (25, 25, 25)
    box_len = 6.96
    box_vecs = box_len * jnp.eye(3)
    ions = [["Li", pot("li.gga.recpot"),
             box_len * jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]

    system = System(box_vecs, shape, ions, terms, units="b",
                    coord_type="fractional")
    system.optimize_density()
    E1 = system.energy("eV")
    den1 = np.asarray(system.density())
    force1 = np.asarray(system.forces())
    stress1 = np.asarray(system.stress())

    system = System(box_vecs, shape, ions, terms, units="b",
                    coord_type="fractional", pme_order=20)
    system.optimize_density()
    E2 = system.energy("eV")
    den2 = np.asarray(system.density())
    force2 = np.asarray(system.forces())
    stress2 = np.asarray(system.stress())

    assert np.allclose(E1, E2)
    assert np.allclose(den1, den2)
    assert np.allclose(force1, force2)
    assert np.allclose(stress1, stress2)


def test_mxu_spread_matches_scatter():
    """The MXU-native separable spread (two dense contractions) must equal
    the fused scatter-add spread to f64 matmul-reassociation noise."""
    import numpy as np
    import jax.numpy as jnp
    from professad_tpu.models.ions import structure_factor_spline

    rng = np.random.default_rng(7)
    box = jnp.asarray(7.0 * np.eye(3) + 0.3 * rng.random((3, 3)))
    coords = jnp.asarray(rng.random((41, 3))) @ box
    shape = (18, 20, 14)
    S_sc = structure_factor_spline(box, shape, coords, 10, method="scatter")
    S_mx = structure_factor_spline(box, shape, coords, 10, method="mxu")
    assert np.allclose(np.asarray(S_mx), np.asarray(S_sc), atol=1e-9)
