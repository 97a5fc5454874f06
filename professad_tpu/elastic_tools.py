"""Drop-in import surface mirroring the reference's
``professad.elastic_tools`` (reference: elastic_tools.py:1-100): EOS
fitting and polycrystalline elastic averages, re-exported from
:mod:`professad_tpu.utils.elastic`."""

from .utils.elastic import (fit_eos, voigt_moduli, reuss_moduli,
                            shear_average, poissons_ratio, youngs_modulus)

__all__ = [
    "fit_eos", "voigt_moduli", "reuss_moduli", "shear_average",
    "poissons_ratio", "youngs_modulus",
]
