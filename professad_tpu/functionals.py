"""Drop-in import surface mirroring the reference's ``professad.functionals``
(reference: functionals.py:1-1460).

Migrating a PROFESS-AD script is a package-name substitution::

    from professad.functionals import IonIon, WangTeter      # reference
    from professad_tpu.functionals import IonIon, WangTeter  # this package

Every public name of the reference module is re-exported here from its
native home in :mod:`professad_tpu.models`.  Semantics are identical
(same units, same defaults); the only behavioural difference is the
framework: terms are pure JAX functions / pytree-param classes instead of
torch modules, so "requires_grad" workflows become ``jax.grad`` /
``System.gs_property_fn`` (see docs/migration.md).
"""

from .models import (
    # interaction terms (reference functionals.py:22-86)
    IonIon, IonElectron, Hartree, hartree_potential,
    # trainable template (functionals.py:92-219)
    KineticFunctional,
    # local/semi-local kinetic (functionals.py:225-560)
    ThomasFermi, Weizsaecker, vWGTF1, vWGTF2, LuoKarasievTrickey,
    PauliGaussian, YukawaGGA,
    # Lindhard helpers + nonlocal kinetic (functionals.py:566-1330)
    G_inv_lind_analytical, G_inv_lind, G_inv_lindhard, non_local_KEF,
    WangTeter, Perrot, SmargiassiMadden, WangGovindCarter98,
    WangTeterStyleFunctional, WangGovindCarter99, FoleyMadden,
    G_inv_gap, KGAP, HuangCarter, RevisedHuangCarter, MiGenovaPavanello,
    XuWangMa,
    # XC (functionals.py:1336-1460)
    lda_exchange, perdew_zunger_correlation, perdew_wang_correlation,
    chachiyo_correlation, PerdewZunger, PerdewWang, Chachiyo,
    pbe_exchange, pbe_correlation, PerdewBurkeErnzerhof,
    # library extension beyond the reference (tutorial-promoted)
    NeuralNetworkFunctional,
)

__all__ = [
    "IonIon", "IonElectron", "Hartree", "hartree_potential",
    "KineticFunctional", "ThomasFermi", "Weizsaecker", "vWGTF1", "vWGTF2",
    "LuoKarasievTrickey", "PauliGaussian", "YukawaGGA",
    "G_inv_lind_analytical", "G_inv_lind", "G_inv_lindhard", "non_local_KEF",
    "WangTeter", "Perrot", "SmargiassiMadden", "WangGovindCarter98",
    "WangTeterStyleFunctional", "WangGovindCarter99", "FoleyMadden",
    "G_inv_gap", "KGAP", "HuangCarter", "RevisedHuangCarter",
    "MiGenovaPavanello", "XuWangMa",
    "lda_exchange", "perdew_zunger_correlation", "perdew_wang_correlation",
    "chachiyo_correlation", "PerdewZunger", "PerdewWang", "Chachiyo",
    "pbe_exchange", "pbe_correlation", "PerdewBurkeErnzerhof",
    "NeuralNetworkFunctional",
]
