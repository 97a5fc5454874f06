"""Physical constants and unit conversions (2018 CODATA).

Parity: /root/reference/src/professad/system.py:26-33 and
/root/reference/src/professad/ion_utils.py:11-13 define the same constants.
"""

M_PER_BOHR = 5.29177210903e-11
A_PER_B = M_PER_BOHR * 1e10  # Angstrom per bohr

J_PER_HA = 4.3597447222071e-18
EV_PER_HA = J_PER_HA / 1.602176634e-19

GPA_PER_ATOMIC = J_PER_HA / M_PER_BOHR**3 * 1e-9

# Legacy constants used by CASTEP-style recpot files
# (parity: ion_utils.py:11-13 uses slightly different, older values on purpose)
RECPOT_BOHR = 0.529177208607388
RECPOT_HARTREE_TO_EV = 27.2113834279111
RECPOT_POT_CONV = 1.0 / (RECPOT_BOHR**3 * RECPOT_HARTREE_TO_EV)
