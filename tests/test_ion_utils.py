"""Ion-ion real-space sum vs CASTEP golden values, NaCl Madelung identity,
and finite-difference stress (parity: /root/reference/tests/test_ion_utils.py)."""

import numpy as np
import jax.numpy as jnp

from professad_tpu.models.ions import ion_interaction_sum
from professad_tpu.system import System
from professad_tpu.models import IonIon
from paths import pot


def _E(box, coords, charges, h_max):
    Rc = 12 * h_max
    Rd = 2 * h_max
    return float(ion_interaction_sum(jnp.asarray(box), jnp.asarray(coords),
                                     jnp.asarray(charges), Rc, Rd))


def test1_ion_ion_interaction():
    # 1) Al (reference energy from CASTEP via wcwitt/real-space-electrostatic-sum)
    box = np.array([[5.41141973394663, 0.0, 0.0],
                    [2.70570986697332, 4.68642696013821, 0.0],
                    [2.70570986697332, 1.56214232004608, 4.41840571073226]])
    coords = np.zeros((1, 3))
    charges = 3.0 * np.ones(1)
    assert abs(_E(box, coords, charges, 4.42) - -2.69595457432924945) < 1e-10

    # 2) Si
    box = np.array([[7.25654832321381, 0.0, 0.0],
                    [3.62827416160690, 6.28435519169252, 0.0],
                    [3.62827416160690, 2.09478506389751, 5.92494689524090]])
    coords = np.array([[0.0, 0.0, 0.0], [0.25, 0.25, 0.25]]) @ box
    charges = 4.0 * np.ones(2)
    assert abs(_E(box, coords, charges, 5.92) - -8.39857465282205418) / 2 < 1e-10

    # 3) SiO2
    box = np.array([[9.28422445623683, 0.0, 0.0],
                    [-4.64211222811842, 8.04037423353787, 0.0],
                    [0.0, 0.0, 10.2139697101486]])
    coords = np.array([[0.41500, 0.27200, 0.21300],
                       [0.72800, 0.14300, 0.54633],
                       [0.85700, 0.58500, 0.87967],
                       [0.27200, 0.41500, 0.78700],
                       [0.14300, 0.72800, 0.45367],
                       [0.58500, 0.85700, 0.12033],
                       [0.46500, 0.00000, 0.33333],
                       [0.00000, 0.46500, 0.66667],
                       [0.53500, 0.53500, 0.00000]]) @ box
    charges = 6.0 * np.ones(9)
    charges[6:] = 4.0
    assert abs(_E(box, coords, charges, 10.21) - -69.48809871723248932) / 9 < 1e-10

    # 4) NaCl Madelung constant via the FCC lattice-sum identity
    h_max = np.sqrt(4 / 3)
    box = np.array([[1.0, 1.0, 0.0], [0.0, 1.0, 1.0], [1.0, 0.0, 1.0]])
    E_FCC = _E(box, np.zeros((1, 3)), np.ones(1), h_max)
    E_2 = _E(box, np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]), np.ones(2), h_max)
    assert abs((4 * E_FCC - E_2) - -1.747564594633) < 1e-10


def test1b_al2sio5():
    box = np.array([[14.7289033699982, 0.0, 0.0],
                    [0.0, 14.9260018049230, 0.0],
                    [0.0, 0.0, 10.5049875335275]])
    frac = np.array([
        [0.23030, 0.13430, 0.23900], [0.76970, 0.86570, 0.23900],
        [0.26970, 0.63430, 0.26100], [0.73030, 0.36570, 0.26100],
        [0.76970, 0.86570, 0.76100], [0.23030, 0.13430, 0.76100],
        [0.73030, 0.36570, 0.73900], [0.26970, 0.63430, 0.73900],
        [0.00000, 0.00000, 0.24220], [0.50000, 0.50000, 0.25780],
        [0.00000, 0.00000, 0.75780], [0.50000, 0.50000, 0.74220],
        [0.37080, 0.13870, 0.50000], [0.42320, 0.36270, 0.50000],
        [0.62920, 0.86130, 0.50000], [0.57680, 0.63730, 0.50000],
        [0.12920, 0.63870, 0.00000], [0.07680, 0.86270, 0.00000],
        [0.87080, 0.36130, 0.00000], [0.92320, 0.13730, 0.00000],
        [0.24620, 0.25290, 0.00000], [0.42400, 0.36290, 0.00000],
        [0.10380, 0.40130, 0.00000], [0.75380, 0.74710, 0.00000],
        [0.57600, 0.63710, 0.00000], [0.89620, 0.59870, 0.00000],
        [0.25380, 0.75290, 0.50000], [0.07600, 0.86290, 0.50000],
        [0.39620, 0.90130, 0.50000], [0.74620, 0.24710, 0.50000],
        [0.92400, 0.13710, 0.50000], [0.60380, 0.09870, 0.50000]])
    coords = frac @ box
    charges = 6.0 * np.ones(32)
    charges[8:13] = 3.0
    charges[14] = 3.0
    charges[16] = 3.0
    charges[18] = 3.0
    charges[20] = 4.0
    charges[23] = 4.0
    charges[26] = 4.0
    charges[29] = 4.0
    assert abs(_E(box, coords, charges, 14.93) - -244.05500850908111943) / 32 < 1e-10


def test2_ion_ion_derivatives():
    """Ion-ion autograd stress vs finite differences (atol 1e-9)."""
    shape = (25, 25, 25)
    box_vecs = jnp.asarray([[6.5, -0.13, 0.25],
                            [-0.33, 7.21, 0.24],
                            [0.55, 0.04, 6.78]])
    frac_ion_coords = jnp.asarray([[0.0, 0.0, 0.0], [0.35, 0.65, 0.45]])
    ions = [["Li", pot("li.gga.recpot"), frac_ion_coords]]
    terms = [IonIon]
    system = System(box_vecs, shape, ions, terms, units="b",
                    coord_type="fractional")

    volume = system.volume("a3")
    lattice_vectors = np.asarray(system.lattice_vectors("a"))
    autograd_stress = np.asarray(system.stress("eV/a3"))

    E_plus = np.empty((3, 3))
    E_minus = np.empty((3, 3))
    eps = 1e-5
    for i in range(3):
        for j in range(3):
            strain = np.zeros((3, 3))
            strain[i, j] += 0.5 * eps
            strain[j, i] += 0.5 * eps
            system.set_lattice(jnp.asarray(lattice_vectors
                                           + lattice_vectors @ strain), units="a")
            E_plus[i, j] = system.energy("eV")
            system.set_lattice(jnp.asarray(lattice_vectors
                                           - lattice_vectors @ strain), units="a")
            E_minus[i, j] = system.energy("eV")
    finite_diff_stress = (E_plus - E_minus) / (2 * eps * volume)
    assert np.allclose(autograd_stress, finite_diff_stress, atol=1e-9)
