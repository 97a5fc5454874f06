"""Energy functionals (the "model families" of an OFDFT code)."""

from .interaction import IonIon, IonElectron, Hartree, hartree_potential
from .xc import (lda_exchange, perdew_zunger_correlation,
                 perdew_wang_correlation, chachiyo_correlation,
                 PerdewZunger, PerdewWang, Chachiyo,
                 pbe_exchange, pbe_correlation, PerdewBurkeErnzerhof)
from .kinetic_local import (ThomasFermi, Weizsaecker, vWGTF1, vWGTF2,
                            LuoKarasievTrickey, PauliGaussian, YukawaGGA)
from .kinetic_nonlocal import (G_inv_lind_analytical, G_inv_lind,
                               G_inv_lindhard, non_local_KEF, WangTeter,
                               Perrot, SmargiassiMadden, WangGovindCarter98,
                               WangTeterStyleFunctional, WangGovindCarter99,
                               FoleyMadden, G_inv_gap, KGAP, HuangCarter,
                               RevisedHuangCarter, MiGenovaPavanello, XuWangMa)
from .base import KineticFunctional
from .neural import NeuralNetworkFunctional
from . import ions  # noqa: F401
