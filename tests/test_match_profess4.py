"""Golden-value tier: single-point energies must match PROFESS 4.0
(parity: /root/reference/tests/test_match_profess4.py, atol 1e-4)."""

import numpy as np
import jax.numpy as jnp

from professad_tpu.system import System
from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                  SmargiassiMadden, PerdewBurkeErnzerhof)
from paths import pot


def test_fcc_aluminium_against_profess4():
    shape = (18, 18, 18)
    box_vecs = 4.050 * jnp.asarray([[0.5, 0.5, 0.0],
                                    [0.0, 0.5, 0.5],
                                    [0.5, 0.0, 0.5]])
    frac_ion_coords = jnp.asarray([[0.0, 0.0, 0.0]])
    ions = [["Al", pot("al.gga.recpot"), frac_ion_coords]]

    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    system = System(box_vecs, shape, ions, terms, units="a",
                    coord_type="fractional")
    system.optimize_density(ntol=1e-7)
    assert np.allclose(system.energy("eV"), -57.183329401794985, atol=1e-4)


def test_bcc_lithium_against_profess4():
    shape = (18, 18, 18)
    box_vecs = 3.48 * jnp.eye(3)
    frac_ion_coords = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    ions = [["Li", pot("li.gga.recpot"), frac_ion_coords]]

    terms = [IonIon, IonElectron, Hartree, SmargiassiMadden,
             PerdewBurkeErnzerhof]
    system = System(box_vecs, shape, ions, terms, units="a",
                    coord_type="fractional")
    system.optimize_density(ntol=1e-7)
    assert np.allclose(system.energy("eV"), -14.741886997024537, atol=1e-4)
