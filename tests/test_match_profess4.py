"""Golden-value tier: single-point energies must match PROFESS 4.0
(coverage parity with /root/reference/tests/test_match_profess4.py,
atol 1e-4 on the same 18^3 configurations)."""

import numpy as np
import jax.numpy as jnp
import pytest

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  SmargiassiMadden, PerdewBurkeErnzerhof)
from paths import pot

FCC_AL = dict(
    cell=4.050 * jnp.asarray([[0.5, 0.5, 0.0],
                              [0.0, 0.5, 0.5],
                              [0.5, 0.0, 0.5]]),
    fracs=jnp.zeros((1, 3)),
    species=("Al", "al.gga.recpot"),
    kinetic=WangTeter,
    E_profess4_eV=-57.183329401794985,
)

BCC_LI = dict(
    cell=3.48 * jnp.eye(3),
    fracs=jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
    species=("Li", "li.gga.recpot"),
    kinetic=SmargiassiMadden,
    E_profess4_eV=-14.741886997024537,
)


@pytest.mark.parametrize("case", [FCC_AL, BCC_LI],
                         ids=["fcc-Al-WT", "bcc-Li-SM"])
def test_energy_matches_profess4(case):
    name, recpot = case["species"]
    system = System(
        case["cell"], (18, 18, 18),
        [[name, pot(recpot), case["fracs"]]],
        [IonIon, IonElectron, Hartree, case["kinetic"],
         PerdewBurkeErnzerhof],
        units="a", coord_type="fractional")
    system.optimize_density(ntol=1e-7)
    assert np.isclose(system.energy("eV"), case["E_profess4_eV"], atol=1e-4)
