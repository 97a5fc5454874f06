"""Ion-related utilities: recpot pseudopotentials, structure factors,
lattice sums and the real-space ion-ion interaction.

TPU-native rebuild of /root/reference/src/professad/ion_utils.py.

Design notes:

* Particle-mesh Ewald charge spreading is a SINGLE fused scatter-add over all
  (ions x order^3) contributions — the reference loops over ions in Python
  (ion_utils.py:270-273).  XLA lowers the scatter to an efficient TPU kernel
  and its transpose (for forces/stress autodiff) is a gather.
* The real-space ion-ion sum replaces torch-nl with a static periodic-image
  shift table (host-side, from the concrete cell) and a `lax.scan` over shift
  chunks, so memory stays bounded for large cutoffs and the whole sum is
  differentiable w.r.t. coordinates and lattice vectors.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfc

from ..ops.grid import wavevecs, volume, safe_sqrt, inv3x3, expi, rfftn
from ..ops.interp import interpolate
from ..utils.constants import RECPOT_BOHR, RECPOT_POT_CONV

__all__ = [
    "get_ion_charge", "read_recpot", "interpolate_recpot",
    "lattice_sum", "structure_factor", "structure_factor_spline",
    "cardinal_b_spline_values", "exponential_spline_b",
    "neighbor_shifts", "ion_interaction_sum",
]


# --------------------------- recpot file reading ---------------------------

def read_recpot(path):
    """Parse a CASTEP-style .recpot file (host-side).

    Returns (ks, pot_ft, z): the k grid [1/bohr], the tabulated local
    pseudopotential with the Coulomb tail ADDED back (so the table is smooth),
    and the inferred ion charge.

    Parity: ion_utils.py:20-81.
    """
    values = []
    with open(path, "r") as fh:
        for line in fh:
            if "END COMMENT" in line:
                break
        fh.readline()  # the '3     5' version line
        k_max = float(fh.readline()) * RECPOT_BOHR
        for line in fh:
            parts = line.split()
            if len(parts) == 3:
                values += parts
    pot_ft = np.asarray(values, dtype=np.float64) * RECPOT_POT_CONV
    if pot_ft.size < 3:
        raise ValueError(f"recpot '{path}': too few tabulated values")
    ks, dk = np.linspace(0.0, k_max, pot_ft.size, retstep=True)
    # infer Z from the k->0 Coulomb limit V(k) - V(0) ~ -4 pi Z / k^2,
    # anchored at TWO small-k points so a malformed table raises instead of
    # silently truncating to a wrong integer (cf. ion_utils.py:20-46)
    z1 = (pot_ft[1] - pot_ft[0]) * dk * dk / (-4.0 * np.pi)
    z2 = (pot_ft[2] - pot_ft[0]) * (2.0 * dk) ** 2 / (-4.0 * np.pi)
    z = round(z1)
    # z == 0 is legitimate (smoothed/neutral tables, e.g. the test-suite's
    # truncated-Coulomb H potential, used with set_electron_number)
    if z < 0 or round(z2) != z or (z > 0 and abs(z1 - z) > 0.05 * z):
        raise ValueError(
            f"recpot '{path}': inconsistent k->0 Coulomb tail "
            f"(Z estimates {z1:.4f} and {z2:.4f}); file may be malformed")
    pot_ft = pot_ft.copy()
    pot_ft[1:] += 4.0 * np.pi * z / (ks[1:] * ks[1:])
    return ks, pot_ft, z


def get_ion_charge(path):
    """Ion charge Z from the k->0 limit -4 pi Z / k^2 (ion_utils.py:20-46)."""
    return read_recpot(path)[2]


def interpolate_recpot(path, ks_interp):
    """Interpolate the tabulated recpot onto wavenumbers ``ks_interp``, with the
    singular Coulomb part handled analytically (ion_utils.py:49-81)."""
    ks, pot_ft, z = read_recpot(path)
    ks_j = jnp.asarray(ks)
    pot_j = jnp.asarray(pot_ft)
    interp = interpolate(ks_j, pot_j, jnp.minimum(ks_interp, ks_j[-1]))
    nz = ks_interp != 0.0
    k_safe = jnp.where(nz, ks_interp, 1.0)
    return jnp.where(nz, interp - 4.0 * np.pi * z / k_safe**2, interp)


# ------------------------- structure factors & sums -------------------------

def lattice_sum(box_vecs, shape, cart_ion_coords, f_tilde, order=None):
    """F(r) = irfftn(S(q) f~(q)) / vol (parity: ion_utils.py:88-118).

    Pencil-aware: under ``ops.grid.pencil_mode`` (inside shard_map),
    ``shape`` is the LOCAL axis-0 slab shape, the structure factor —
    exact (``wavevecs`` dispatches to the k-pencil) or PME (masked-slab
    spread + pencil FFT + k-pencil deconvolution) — is evaluated on this
    device's k-pencil, and the inverse transform is a pencil FFT — this
    is how the distributed forces/stress rebuild v_ext(R, h) without
    gathering the grid."""
    from ..ops import grid as _grid
    if order is None:
        S = structure_factor(box_vecs, shape, cart_ion_coords)
    else:
        if not (order % 2 == 0 and order >= 2):
            raise ValueError("PME requires an even order >= 2")
        S = structure_factor_spline(box_vecs, shape, cart_ion_coords, order)
    if _grid._PENCIL_AXIS is not None:
        from ..parallel import pfft
        ax = _grid._PENCIL_AXIS
        n_glob = (shape[0] * jax.lax.axis_size(ax)) * shape[1] * shape[2]
        # norm="forward" semantics: the inverse transform is unscaled
        return (n_glob * pfft.pirfftn_dc(S * f_tilde, shape, ax)
                / volume(box_vecs))
    return (jnp.fft.irfftn(S * f_tilde, shape, norm="forward")
            / volume(box_vecs))


def structure_factor(box_vecs, shape, cart_ion_coords):
    """Exact O(N_grid * N_ions) structure factor S(q) = sum_i e^{-i q.r_i}
    (parity: ion_utils.py:121-137)."""
    kx, ky, kz, _ = wavevecs(box_vecs, shape)
    kr = (kx[..., None] * cart_ion_coords[:, 0]
          + ky[..., None] * cart_ion_coords[:, 1]
          + kz[..., None] * cart_ion_coords[:, 2])
    return jnp.sum(expi(-kr), axis=-1)


def cardinal_b_spline_values(x, order):
    """[M_n(x + i) for i = 0..n-1] for x in [0, 1), by the stable recurrence
    M_n[i] = ((x+i) M_{n-1}[i] + (n-x-i) M_{n-1}[i-1]) / (n-1).

    Purely functional (autodiff-safe) — the reference needed a double-buffer
    contraption to avoid in-place ops (ion_utils.py:140-204); in JAX the naive
    recurrence is already immutable.
    """
    if order < 2:
        raise ValueError("Requires order n >= 2")
    zeros = jnp.zeros_like(x)
    M = [x, 1.0 - x] + [zeros] * (order - 2)
    for n in range(3, order + 1):
        new = [None] * order
        for i in range(n - 1, 0, -1):
            new[i] = ((x + i) * M[i] + (n - x - i) * M[i - 1]) / (n - 1)
        new[0] = x / (n - 1) * M[0]
        for i in range(n, order):
            new[i] = M[i]
        M = new
    return jnp.stack(M)


def exponential_spline_b(m, N, order):
    """Exponential-spline deconvolution factors b(m) (ion_utils.py:207-215)."""
    zero = jnp.zeros_like(m)
    M = cardinal_b_spline_values(zero, order)  # (order, len(m))
    i = jnp.arange(order, dtype=m.dtype)[:, None]
    b = jnp.sum(M * expi(2.0 * np.pi * m * (i - 1.0) / N), axis=0)
    return expi(2.0 * np.pi * m * (order - 1.0) / N) / b


def _spread_scatter(shape, l0, l1, l2, M0, M1, M2):
    """Charge spreading as one fused scatter-add over (ions x order^3)
    updates (the reference loops over ions in Python, ion_utils.py:270-273)."""
    N0, N1, N2 = shape
    w = (M0[:, None, None, :] * M1[None, :, None, :] * M2[None, None, :, :])
    flat_idx = ((l0[:, None, None, :] * N1 + l1[None, :, None, :]) * N2
                + l2[None, None, :, :])
    Q = jnp.zeros(N0 * N1 * N2, dtype=w.dtype)
    Q = Q.at[flat_idx.reshape(-1)].add(w.reshape(-1))
    return Q.reshape(shape)


def _spread_scatter_slab(local_shape, l0_local, l1, l2, M0, M1, M2):
    """Zero-communication distributed charge spreading: every device runs
    the SAME (ions x order^3) stencil over the replicated coordinates and
    keeps only the rows that land in its axis-0 slab (``mode='drop'``
    discards out-of-slab updates).  The per-device extra work is the
    O(N_ions * order^3) stencil itself — negligible against the grid — so
    the PME spread needs no halo exchange at all; the mod-N0 wrap rows
    land on whichever device owns them.  The scatter transpose (forces /
    stress autodiff) is the matching slab gather."""
    w = (M0[:, None, None, :] * M1[None, :, None, :] * M2[None, None, :, :])
    Q = jnp.zeros(local_shape, dtype=w.dtype)
    order, n_ions = l1.shape
    i0 = jnp.broadcast_to(l0_local[:, None, None, :],
                          (order, order, order, n_ions)).reshape(-1)
    i1 = jnp.broadcast_to(l1[None, :, None, :],
                          (order, order, order, n_ions)).reshape(-1)
    i2 = jnp.broadcast_to(l2[None, None, :, :],
                          (order, order, order, n_ions)).reshape(-1)
    return Q.at[i0, i1, i2].add(w.reshape(-1), mode="drop")


def _spread_mxu(shape, l0, l1, l2, M0, M1, M2, ion_chunk=256):
    """MXU-native charge spreading: the per-ion B-spline stencil is a rank-1
    tensor S0_i (x) S1_i (x) S2_i, so the full spread is the contraction
    Q[a,b,c] = sum_i S0[i,a] S1[i,b] S2[i,c] — two dense matmuls on the
    systolic array instead of a serialized scatter.  New design (no reference
    counterpart); used for large ion counts where scatter-add serializes.
    """
    N0, N1, N2 = shape
    n_ions = l0.shape[0]  # arrays are (n_ions, order)
    dt = M0.dtype

    def axis_dense(l, M, N):
        # (n_ions, N) dense spread along one axis; per-row indices are
        # distinct so the small scatter has no collisions
        S = jnp.zeros((n_ions, N), dt)
        ions = jnp.broadcast_to(jnp.arange(n_ions)[:, None], l.shape)
        return S.at[ions.reshape(-1), l.reshape(-1)].set(M.reshape(-1))

    S0 = axis_dense(l0, M0, N0)
    S1 = axis_dense(l1, M1, N1)
    S2 = axis_dense(l2, M2, N2)

    n_pad = (-n_ions) % ion_chunk
    if n_pad:
        S0 = jnp.pad(S0, ((0, n_pad), (0, 0)))
        S1 = jnp.pad(S1, ((0, n_pad), (0, 0)))
        S2 = jnp.pad(S2, ((0, n_pad), (0, 0)))
    S0 = S0.reshape(-1, ion_chunk, N0)
    S1 = S1.reshape(-1, ion_chunk, N1)
    S2 = S2.reshape(-1, ion_chunk, N2)

    def body(Q, args):
        s0, s1, s2 = args
        T = s1[:, :, None] * s2[:, None, :]            # (chunk, N1, N2)
        # HIGHEST precision: the default lowers f32 multiplies to bf16 on
        # TPU (~1e-3 relative error in the charge grid), far above the f32
        # accuracy budget of the PME path
        Q = Q + jnp.einsum("ia,ibc->abc", s0, T,
                           preferred_element_type=dt,
                           precision=jax.lax.Precision.HIGHEST)
        return Q, None

    Q, _ = jax.lax.scan(body, jnp.zeros(shape, dt), (S0, S1, S2))
    return Q


def structure_factor_spline(box_vecs, shape, cart_ion_coords, order,
                            method="auto"):
    """Particle-Mesh Ewald structure factor via cardinal B-splines
    (parity: ion_utils.py:218-286).

    ``method``: 'scatter' (fused scatter-add), 'mxu' (dense separable
    contraction on the matrix unit), or 'auto' (scatter for few ions).

    Pencil-aware: under ``ops.grid.pencil_mode`` (inside shard_map),
    ``shape`` is the LOCAL axis-0 slab shape.  The spread runs as a
    zero-communication masked scatter (:func:`_spread_scatter_slab` —
    every device stencils the replicated coordinates and keeps its own
    rows), the transform is the pencil rfftn, and the B-spline
    deconvolution factors are evaluated on this device's global k-pencil
    indices.  Same floating-point recipe as the serial form up to the
    pencil FFT's reduction order."""
    from ..ops import grid as _grid
    ax = _grid._PENCIL_AXIS
    N0, N1, N2 = shape  # LOCAL slab shape under pencil_mode
    if ax is not None:
        n_dev = jax.lax.axis_size(ax)
        N0_glob = N0 * n_dev
    else:
        N0_glob = N0
    frac = cart_ion_coords @ inv3x3(box_vecs)
    # wrap into [0,1); done twice so values like -1e-16 -> 1.0 -> 0.0
    frac = frac - jnp.floor(frac)
    frac = frac - jnp.floor(frac)

    u0 = frac[:, 0] * N0_glob
    u1 = frac[:, 1] * N1
    u2 = frac[:, 2] * N2
    f0 = jnp.floor(u0)
    f1 = jnp.floor(u1)
    f2 = jnp.floor(u2)

    M0 = cardinal_b_spline_values(u0 - f0, order)  # (order, n_ions)
    M1 = cardinal_b_spline_values(u1 - f1, order)
    M2 = cardinal_b_spline_values(u2 - f2, order)

    orders = jnp.arange(order)[:, None]
    l0 = jnp.mod(orders - f0.astype(jnp.int32), N0_glob)  # (order, n_ions)
    l1 = jnp.mod(orders - f1.astype(jnp.int32), N1)
    l2 = jnp.mod(orders - f2.astype(jnp.int32), N2)

    if ax is not None:
        # out-of-slab rows go to the out-of-bounds sentinel N0 (dropped by
        # the scatter) rather than negative indices, which jnp would wrap
        row0 = jax.lax.axis_index(ax) * N0
        in_slab = (l0 >= row0) & (l0 < row0 + N0)
        l0_local = jnp.where(in_slab, l0 - row0, N0)
        Q = _spread_scatter_slab(shape, l0_local, l1, l2, M0, M1, M2)
    else:
        if method == "auto":
            method = "mxu" if cart_ion_coords.shape[0] >= 512 else "scatter"
        if method == "scatter":
            Q = _spread_scatter(shape, l0, l1, l2, M0, M1, M2)
        elif method == "mxu":
            Q = _spread_mxu(shape, l0.T, l1.T, l2.T, M0.T, M1.T, M2.T)
        else:
            raise ValueError("method must be 'auto', 'scatter' or 'mxu'")
    Q_ft = rfftn(Q)  # pencil-aware dispatch: k-slab (N0_glob, N1/P, m2)

    dtype = cart_ion_coords.dtype
    b0 = exponential_spline_b(jnp.arange(Q_ft.shape[0], dtype=dtype),
                              N0_glob, order)
    if ax is not None:
        n1loc = Q_ft.shape[1]
        m1 = (jax.lax.axis_index(ax) * n1loc
              + jnp.arange(n1loc)).astype(dtype)
        b1 = exponential_spline_b(m1, N1, order)
    else:
        b1 = exponential_spline_b(jnp.arange(Q_ft.shape[1], dtype=dtype),
                                  N1, order)
    b2 = exponential_spline_b(jnp.arange(Q_ft.shape[2], dtype=dtype), N2, order)
    B = b0[:, None, None] * b1[None, :, None] * b2[None, None, :]
    return jnp.conj(B * Q_ft)


# --------------------------- real-space ion-ion sum ---------------------------

def neighbor_shifts(box_vecs, Rc):
    """Static table of periodic-image shifts (in lattice units) covering a
    sphere of radius Rc.  Host-side numpy from a CONCRETE cell; replaces the
    torch-nl neighbor list (ion_utils.py:313-316)."""
    bv = np.asarray(box_vecs, dtype=np.float64)
    # interplanar spacings h_i = 1 / |row_i of inv(bv)^T|
    inv_T = np.linalg.inv(bv.T)
    h = 1.0 / np.sqrt(np.sum(inv_T**2, axis=1))
    n = np.ceil(float(Rc) / h).astype(int) + 1
    grids = np.meshgrid(*(np.arange(-ni, ni + 1) for ni in n), indexing="ij")
    shifts = np.stack([g.reshape(-1) for g in grids], axis=1).astype(np.float64)
    # keep only images whose closest approach to the home cell can be < Rc:
    # distance between cell centers minus cell diameter is a safe lower bound
    centers = shifts @ bv
    diam = np.sqrt(3.0) * np.max(np.linalg.norm(bv, axis=1))
    keep = np.linalg.norm(centers, axis=1) <= float(Rc) + diam
    return shifts[keep]


def ion_interaction_sum(box_vecs, coords, charges, Rc, Rd, shifts=None,
                        chunk=256):
    """Real-space damped pairwise electrostatic sum in a neutralizing
    background (Witt et al., PRMaterials 2, 013806).

    E = 1/2 sum_{i != j, |r_ij| < Rc} Z_i Z_j erfc(r_ij / Rd) / r_ij
        + per-ion adaptive-radius correction terms.

    Parity: ion_utils.py:293-333.  ``shifts`` (lattice-unit image table) may
    be precomputed with ``neighbor_shifts`` for use under tracing; the energy
    is differentiable w.r.t. ``coords`` and ``box_vecs``.
    """
    if shifts is None:
        shifts = neighbor_shifts(box_vecs, Rc)
    n_ions = coords.shape[0]
    dtype = coords.dtype

    # pad shift table to a multiple of the chunk size
    n_shifts = shifts.shape[0]
    n_pad = (-n_shifts) % chunk
    shifts_padded = np.concatenate(
        [np.asarray(shifts), np.zeros((n_pad, 3))], axis=0)
    pad_mask = np.concatenate(
        [np.ones(n_shifts, bool), np.zeros(n_pad, bool)])
    shift_chunks = jnp.asarray(shifts_padded.reshape(-1, chunk, 3), dtype=dtype)
    mask_chunks = jnp.asarray(pad_mask.reshape(-1, chunk))

    Rc = jnp.asarray(Rc, dtype)
    Rd = jnp.asarray(Rd, dtype)

    def body(carry, args):
        E_acc, Q_acc = carry
        s_chunk, m_chunk = args
        # r_vec[b, i, j] = R_j + s_b . h - R_i
        disp = (coords[None, None, :, :] + (s_chunk @ box_vecs)[:, None, None, :]
                - coords[None, :, None, :])
        r2 = jnp.sum(disp * disp, axis=-1)
        r = safe_sqrt(r2)
        valid = (r < Rc) & (r > 1e-12) & m_chunk[:, None, None]
        r_safe = jnp.where(valid, r, 1.0)
        zz = charges[:, None] * charges[None, :]
        pair_E = jnp.where(valid, zz * erfc(r_safe / Rd) / r_safe, 0.0)
        E_acc = E_acc + 0.5 * jnp.sum(pair_E)
        # neighbor-charge accumulation: Q_i += sum_{j, b} Z_j [valid]
        Q_acc = Q_acc + jnp.sum(jnp.where(valid, charges[None, None, :], 0.0),
                                axis=(0, 2))
        return (E_acc, Q_acc), None

    (E_local, Qi), _ = jax.lax.scan(
        body, (jnp.zeros((), dtype), jnp.zeros(n_ions, dtype)),
        (shift_chunks, mask_chunks))

    rho = jnp.sum(charges) / volume(box_vecs)
    aux = (0.75 / np.pi) * Qi / rho
    Ra = jnp.sign(aux) * jnp.abs(aux) ** (1.0 / 3.0)
    sqrt_pi = float(np.sqrt(np.pi))  # plain float: keeps f32 weak-typing
    E_corr = jnp.sum(
        -np.pi * charges * rho * Ra**2
        + np.pi * charges * rho * (Ra**2 - 0.5 * Rd * Rd) * erf(Ra / Rd)
        + sqrt_pi * charges * rho * Ra * Rd * jnp.exp(-Ra**2 / Rd**2)
        - charges**2 / sqrt_pi / Rd)
    return E_local + E_corr
