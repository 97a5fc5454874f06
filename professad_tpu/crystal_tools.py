"""Drop-in import surface mirroring the reference's
``professad.crystal_tools`` (reference: crystal_tools.py:1-120): crystal
cell generators, re-exported from :mod:`professad_tpu.utils.crystal`."""

from .utils.crystal import (get_cell, simple_cubic, body_centered_cubic,
                            face_centered_cubic, diamond_cubic,
                            hexagonal_close_packed)

__all__ = [
    "get_cell", "simple_cubic", "body_centered_cubic",
    "face_centered_cubic", "diamond_cubic", "hexagonal_close_packed",
]
