"""Drop-in import surface mirroring the reference's ``professad.ion_utils``
(reference: ion_utils.py:1-340).

Pseudopotential IO, structure factors (exact and PME B-spline), the
k-space lattice sum and the real-space damped-Coulomb ion-ion sum,
re-exported from :mod:`professad_tpu.models.ions`.  Signature note:
``ion_interaction_sum`` accepts the reference's positional form
``(box_vecs, coords, charges, Rc, Rd)``; the extra ``shifts=`` keyword is
an optional precomputed image table (the torch-nl dependency is replaced
by a static ``neighbor_shifts`` table + ``lax.scan``).
"""

from .models.ions import (get_ion_charge, interpolate_recpot, lattice_sum,
                          structure_factor, cardinal_b_spline_values,
                          exponential_spline_b, structure_factor_spline,
                          ion_interaction_sum, neighbor_shifts, read_recpot)

__all__ = [
    "get_ion_charge", "interpolate_recpot", "lattice_sum",
    "structure_factor", "cardinal_b_spline_values", "exponential_spline_b",
    "structure_factor_spline", "ion_interaction_sum", "neighbor_shifts",
    "read_recpot",
]
