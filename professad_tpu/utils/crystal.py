"""Crystal structure generators (lattice vectors + ionic coordinates).

TPU-native rebuild of /root/reference/src/professad/crystal_tools.py.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ["get_cell", "simple_cubic", "body_centered_cubic",
           "face_centered_cubic", "diamond_cubic", "hexagonal_close_packed"]


def get_cell(crystal, vol_per_atom, c_over_a=np.sqrt(8.0 / 3.0),
             coord_type="fractional"):
    """Lattice vectors and ion coordinates for simple crystal structures
    (parity: crystal_tools.py:11-59).

    crystal: 'sc', 'bcc', 'bcc-c', 'fcc', 'fcc-c', 'dc', 'dc-c', 'hcp'.
    """
    if crystal == "sc":
        lv, fc = simple_cubic(vol_per_atom)
    elif crystal == "bcc":
        lv, fc = body_centered_cubic(vol_per_atom, "primitive")
    elif crystal == "bcc-c":
        lv, fc = body_centered_cubic(vol_per_atom, "conventional")
    elif crystal == "fcc":
        lv, fc = face_centered_cubic(vol_per_atom, "primitive")
    elif crystal == "fcc-c":
        lv, fc = face_centered_cubic(vol_per_atom, "conventional")
    elif crystal == "dc":
        lv, fc = diamond_cubic(vol_per_atom, "primitive")
    elif crystal == "dc-c":
        lv, fc = diamond_cubic(vol_per_atom, "conventional")
    elif crystal == "hcp":
        lv, fc = hexagonal_close_packed(vol_per_atom, c_over_a)
    else:
        raise ValueError(f"'crystal' argument '{crystal}' not recognized")
    if coord_type == "fractional":
        return lv, fc
    if coord_type == "cartesian":
        return lv, fc @ lv
    raise ValueError("coord_type must be 'fractional' or 'cartesian'")


def simple_cubic(vol_per_atom):
    a = vol_per_atom ** (1.0 / 3.0)
    return a * jnp.eye(3), jnp.zeros((1, 3))


def body_centered_cubic(vol_per_atom, cell_type="conventional"):
    a = (2.0 * vol_per_atom) ** (1.0 / 3.0)
    if cell_type == "primitive":
        lv = a * jnp.asarray([[-0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, -0.5]])
        fc = jnp.zeros((1, 3))
    elif cell_type == "conventional":
        lv = a * jnp.eye(3)
        fc = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    else:
        raise ValueError("cell_type must be 'primitive' or 'conventional'")
    return lv, fc


def face_centered_cubic(vol_per_atom, cell_type="primitive"):
    a = (4.0 * vol_per_atom) ** (1.0 / 3.0)
    if cell_type == "primitive":
        lv = a * jnp.asarray([[0.0, 0.5, 0.5], [0.5, 0.0, 0.5], [0.5, 0.5, 0.0]])
        fc = jnp.zeros((1, 3))
    elif cell_type == "conventional":
        lv = a * jnp.eye(3)
        fc = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                          [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    else:
        raise ValueError("cell_type must be 'primitive' or 'conventional'")
    return lv, fc


def diamond_cubic(vol_per_atom, cell_type="conventional"):
    a = (8.0 * vol_per_atom) ** (1.0 / 3.0)
    if cell_type == "primitive":
        lv = a * jnp.asarray([[0.0, 0.5, 0.5], [0.5, 0.0, 0.5], [0.5, 0.5, 0.0]])
        fc = jnp.asarray([[0.0, 0.0, 0.0], [0.25, 0.25, 0.25]])
    elif cell_type == "conventional":
        lv = a * jnp.eye(3)
        fc = jnp.asarray([[0.00, 0.00, 0.00], [0.50, 0.50, 0.00],
                          [0.50, 0.00, 0.50], [0.00, 0.50, 0.50],
                          [0.25, 0.25, 0.25], [0.25, 0.75, 0.75],
                          [0.75, 0.75, 0.25], [0.75, 0.25, 0.75]])
    else:
        raise ValueError("cell_type must be 'primitive' or 'conventional'")
    return lv, fc


def hexagonal_close_packed(vol_per_atom, c_over_a=1.633):
    a = ((2.0 * vol_per_atom) / (np.sqrt(3.0) / 2.0 * c_over_a)) ** (1.0 / 3.0)
    lv = a * jnp.asarray([[1.0, 0.0, 0.0],
                          [-0.5, np.sqrt(3.0) / 2.0, 0.0],
                          [0.0, 0.0, c_over_a]])
    fc = jnp.asarray([[1.0 / 3.0, 2.0 / 3.0, 0.75],
                      [2.0 / 3.0, 1.0 / 3.0, 0.25]])
    return lv, fc
