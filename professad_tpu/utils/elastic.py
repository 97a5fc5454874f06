"""Equation-of-state fitting and elastic-moduli post-processing.

TPU-native rebuild of /root/reference/src/professad/elastic_tools.py.
Fitting runs host-side with scipy (as in the reference); moduli helpers
accept jnp or numpy arrays.
"""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import curve_fit

__all__ = ["fit_eos", "voigt_moduli", "reuss_moduli", "shear_average",
           "poissons_ratio", "youngs_modulus"]


def fit_eos(vol, ene, eos="bm", plot=False):
    """Fit (V, E) data to the Murnaghan ('m') or Birch-Murnaghan ('bm')
    equation of state.  Returns (params, errors) with params ordered
    (K0, K0', E0, V0) (parity: elastic_tools.py:16-77)."""
    vol, ene = np.asarray(vol), np.asarray(ene)
    # harmonic-solid initial guess: E = E0 + 0.5 K0 (V - V0)^2 / V0
    apar, bpar, cpar = np.polyfit(vol, ene, 2)
    K0_g = -bpar
    V0_g = K0_g / (2 * apar)
    E0_g = cpar - 0.5 * K0_g * V0_g
    K0prime_g = 3.5

    def murn(v, K0, K0prime, E0, V0):
        if eos == "m":
            return (E0 + (K0 * v / K0prime) * ((((V0 / v) ** K0prime)
                    / (K0prime - 1)) + 1) - K0 * V0 / (K0prime - 1))
        if eos == "bm":
            x = (V0 / v) ** (2.0 / 3.0) - 1.0
            return E0 + 9 * V0 * K0 / 16 * (K0prime * x**3
                                            + x**2 * (6 - 4 * ((V0 / v) ** (2.0 / 3.0))))
        raise ValueError("Only 'm' or 'bm' recognized for 'eos'")

    params, pcov = curve_fit(murn, vol, ene, p0=(K0_g, K0prime_g, E0_g, V0_g),
                             maxfev=1000)
    err = np.sqrt(np.diag(pcov))
    if plot:  # pragma: no cover - interactive convenience
        import matplotlib.pyplot as plt
        plt.plot(vol, ene, "rx")
        vfit = np.linspace(0.99 * vol[0], 1.01 * vol[-1])
        plt.plot(vfit, murn(vfit, *params), "b-")
        plt.xlabel("Volume/A^3")
        plt.ylabel("Energy/eV")
        plt.legend(["data", "fit"], loc="best")
        plt.show()
    return params, err


def voigt_moduli(C):
    """Voigt bulk and shear moduli from a 6x6 elastic-constant matrix
    (parity: elastic_tools.py:80-98)."""
    C = jnp.asarray(C)
    K = (1.0 / 9.0) * ((C[0, 0] + C[1, 1] + C[2, 2])
                       + 2 * (C[0, 1] + C[1, 2] + C[0, 2]))
    G = (1.0 / 15.0) * ((C[0, 0] + C[1, 1] + C[2, 2])
                        - (C[0, 1] + C[1, 2] + C[0, 2])
                        + 3 * (C[3, 3] + C[4, 4] + C[5, 5]))
    return K, G


def reuss_moduli(C):
    """Reuss bulk and shear moduli via the compliance matrix S = C^{-1}
    (parity: elastic_tools.py:101-122)."""
    # host-side numpy: 6x6 inverse (jnp.linalg.inv has no f64 TPU kernel)
    S = np.linalg.inv(np.asarray(C))
    K = 1.0 / ((S[0, 0] + S[1, 1] + S[2, 2]) + 2 * (S[0, 1] + S[1, 2] + S[0, 2]))
    G = 15.0 / (4 * (S[0, 0] + S[1, 1] + S[2, 2])
                - 4 * (S[0, 1] + S[1, 2] + S[0, 2])
                + 3 * (S[3, 3] + S[4, 4] + S[5, 5]))
    return K, G


def shear_average(C, mean_type="arithmetic"):
    """Voigt-Reuss average shear modulus (parity: elastic_tools.py:125-143)."""
    _, Gv = voigt_moduli(C)
    _, Gr = reuss_moduli(C)
    if mean_type == "arithmetic":
        return 0.5 * (Gv + Gr)
    if mean_type == "geometric":
        return (Gv * Gr) ** 0.5
    raise ValueError("mean_type must be 'arithmetic' or 'geometric'")


def poissons_ratio(K, G):
    """nu = (1 - 3G/(3K+G))/2 (parity: elastic_tools.py:146-160)."""
    return 0.5 * (1.0 - 3.0 * G / (3.0 * K + G))


def youngs_modulus(K, G):
    """E = 1/(1/(3G) + 1/(9K)) (parity: elastic_tools.py:163-177)."""
    return 1.0 / (1.0 / (3.0 * G) + 1.0 / (9.0 * K))
