"""Jitted optimizers for density and geometry optimization.

TPU-native rebuild of the reference's vendored optimizers
(/root/reference/src/professad/_optimizers/lbfgs/lbfgsnew.py and
tpgd/two_point_gradient_descent.py).  Behavioral parity notes:

* The reference density optimizer runs L-BFGS (history 8) WITHOUT line search:
  a fixed step ``lr`` along the two-loop direction, with the very first step
  scaled to ``min(1, 1/|g|_1) * lr`` (lbfgsnew.py:676-681), and a curvature
  filter ``y.s > 1e-10 ||s||^2`` guarding the memory update (lbfgsnew.py:652).
* TPGD is Barzilai-Borwein: alpha = (dx.dx)/(dx.dg) with fallback to ``lr``
  on the first step or non-positive curvature (two_point_gradient_descent.py).

Here the history lives in fixed-shape ring buffers and every update is a
masked ``where`` — the entire optimizer is one XLA program; there is no
Python dispatch per closure evaluation.  An optional cubic-free backtracking
line search (`armijo=True`) is available for the geometry path.
"""

from typing import NamedTuple, Callable

import jax
import jax.numpy as jnp

__all__ = ["LBFGSState", "lbfgs_init", "lbfgs_iterations", "lbfgs_minimize",
           "TPGDState", "tpgd_init", "tpgd_step", "tpgd_minimize",
           "tpgd_iteration"]


class LBFGSState(NamedTuple):
    x: jnp.ndarray          # flat parameter vector
    f: jnp.ndarray          # scalar objective
    g: jnp.ndarray          # flat gradient
    g_prev: jnp.ndarray     # gradient before the last move (for y = g - g_prev)
    S: jnp.ndarray          # (history, n) step ring buffer
    Y: jnp.ndarray          # (history, n) grad-diff ring buffer
    rho: jnp.ndarray        # (history,) 1/(y.s); 0 marks an empty slot
    H_diag: jnp.ndarray     # scalar initial inverse-Hessian scale
    t_prev: jnp.ndarray     # last step size taken
    d_prev: jnp.ndarray     # last direction taken
    n_iter: jnp.ndarray     # total L-BFGS iterations so far (int32)


def lbfgs_init(value_and_grad, x0, history=8):
    f0, g0 = value_and_grad(x0)
    n = x0.size
    dt = x0.dtype
    g0 = g0.reshape(-1)
    return LBFGSState(
        x=x0.reshape(-1), f=f0, g=g0, g_prev=g0,
        S=jnp.zeros((history, n), dt), Y=jnp.zeros((history, n), dt),
        rho=jnp.zeros((history,), dt), H_diag=jnp.ones((), dt),
        t_prev=jnp.zeros((), dt), d_prev=jnp.zeros((n,), dt),
        n_iter=jnp.zeros((), jnp.int32),
    )


def _pdot(axis_name):
    """Inner product, psum'd over a mesh axis in SPMD (shard_map) mode."""
    if axis_name is None:
        return jnp.dot
    return lambda a, b: jax.lax.psum(jnp.dot(a, b), axis_name)


def _two_loop(g, S, Y, rho, H_diag, M=None, axis_name=None):
    """Two-loop recursion d = -H g over the masked ring buffers
    (parity: lbfgsnew.py:689-713).  Buffers are ordered oldest-first by
    construction (we roll on insert), so a plain scan is correct.
    ``M`` optionally applies a preconditioner as the initial inverse
    Hessian (r = H_diag * M q).  ``axis_name``: SPMD mode over local
    shards (see tpgd_minimize)."""
    history = S.shape[0]
    dot = _pdot(axis_name)

    def bwd(carry, i):
        q = carry
        idx = history - 1 - i
        al = rho[idx] * dot(S[idx], q)
        q = q - al * Y[idx]
        return q, al

    q, al_rev = jax.lax.scan(bwd, -g, jnp.arange(history))
    r = H_diag * (q if M is None else M(q))

    def fwd(carry, i):
        r = carry
        be = rho[i] * dot(Y[i], r)
        r = r + (al_rev[history - 1 - i] - be) * S[i]
        return r, None

    r, _ = jax.lax.scan(fwd, r, jnp.arange(history))
    return r


def lbfgs_iterations(value_and_grad: Callable, state: LBFGSState, num_iters: int,
                     lr: float, apply_H0: Callable = None,
                     axis_name=None) -> LBFGSState:
    """Run ``num_iters`` L-BFGS iterations (the reference's
    ``optimizer.step()`` with ``max_iter=num_iters``), fully jittable.

    ``apply_H0``: optional SPD preconditioner M applied as the initial
    inverse Hessian in the two-loop recursion (r = gamma M q with
    gamma = y.s / y.My).  For plane-wave density optimization a spectral
    (Teter-style) M built from the uniform-gas Hessian diagonal cuts the
    iteration count dramatically at fine grids (the Hessian spans k^2/4 for
    the von Weizsaecker term at high k to 4 pi n0 / k^2 for Hartree at low
    k).  The reference has no preconditioning.
    """
    history = state.S.shape[0]
    dot = _pdot(axis_name)

    def body(i, st):
        first = st.n_iter == 0

        # --- memory update from the previous move --------------------------
        y = st.g - st.g_prev
        s = st.t_prev * st.d_prev
        ys = dot(y, s)
        sn2 = dot(s, s)
        accept = jnp.logical_and(jnp.logical_not(first), ys > 1e-10 * sn2)

        S_new = jnp.where(accept, jnp.roll(st.S, -1, axis=0).at[-1].set(s), st.S)
        Y_new = jnp.where(accept, jnp.roll(st.Y, -1, axis=0).at[-1].set(y), st.Y)
        rho_new = jnp.where(
            accept,
            jnp.roll(st.rho, -1).at[-1].set(jnp.where(ys != 0, 1.0 / ys, 0.0)),
            st.rho)
        yMy = dot(y, y if apply_H0 is None else apply_H0(y))
        H_new = jnp.where(accept, ys / yMy, st.H_diag)

        # --- direction ------------------------------------------------------
        g0 = st.g if apply_H0 is None else apply_H0(st.g)
        d = jnp.where(first, -g0,
                      _two_loop(st.g, S_new, Y_new, rho_new, H_new, apply_H0,
                                axis_name=axis_name))

        # --- fixed step (lbfgsnew.py:676-681) --------------------------------
        abs_g_sum = jnp.sum(jnp.abs(st.g))
        if axis_name is not None:
            abs_g_sum = jax.lax.psum(abs_g_sum, axis_name)
        t = jnp.where(first, jnp.minimum(1.0, 1.0 / abs_g_sum) * lr, lr)

        x_new = st.x + t * d
        f_new, g_new = value_and_grad(x_new)
        return LBFGSState(x=x_new, f=f_new, g=g_new.reshape(-1), g_prev=st.g,
                          S=S_new, Y=Y_new, rho=rho_new, H_diag=H_new,
                          t_prev=t, d_prev=d, n_iter=st.n_iter + 1)

    return jax.lax.fori_loop(0, num_iters, body, state)


def lbfgs_minimize(value_and_grad, x0, lr=0.1, ntol=1e-7, conv_count=3,
                   max_iter=1000, history=8, f_scale=1.0, skip_iters=5,
                   apply_H0=None, block=6, stop_fn=None, axis_name=None):
    """Whole density optimization as ONE XLA program.

    ``lax.while_loop`` around *blocks* of ``block`` L-BFGS iterations with
    the reference's stopping rule: the convergence measure is evaluated once
    per outer step (= one ``optimizer.step()`` of ``block`` inner iterations,
    matching the host loop and reference system.py:866-906), must satisfy
    ``stop_var < ntol`` for ``conv_count`` consecutive outer steps, and is
    only checked after ``skip_iters`` outer steps.  ``max_iter`` counts outer
    steps, like the reference's ``n_maxiter``.

    ``stop_fn(state, f_prev) -> scalar`` customizes the convergence measure
    (e.g. max|dE/dchi| or the Euler-equation residual); the default is
    ``|dE| * f_scale`` (``f_scale`` converts the objective to the units the
    tolerance is stated in — the reference's ntol is in eV while energies
    are Hartree).  No host synchronization until the result is fetched — on
    TPU the full optimization runs as one dispatched program.

    Returns (state, n_outer_steps, converged).
    """
    state0 = lbfgs_init(value_and_grad, x0, history)

    def cond(carry):
        st, f_prev, cnt, it = carry
        return jnp.logical_and(cnt < conv_count, it < max_iter)

    def body(carry):
        st, f_prev, cnt, it = carry
        st_new = lbfgs_iterations(value_and_grad, st, block, lr,
                                  apply_H0=apply_H0, axis_name=axis_name)
        # freeze converged lanes: under vmap (batched EOS volume scans) the
        # while_loop body keeps running until EVERY lane's cond is false, so
        # a converged lane must stop mutating or its noise bounce could
        # reset the counter and un-converge it (same as tpgd_minimize)
        done = cnt >= conv_count
        st_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(done, old, new), st_new, st)
        if stop_fn is None:
            stop_var = jnp.abs(st_new.f - f_prev) * f_scale
        else:
            stop_var = stop_fn(st_new, f_prev)
        hit = jnp.logical_and(it + 1 > skip_iters, stop_var < ntol)
        cnt = jnp.where(done, cnt, jnp.where(hit, cnt + 1, 0))
        return (st_new, st_new.f, cnt, jnp.where(done, it, it + 1))

    init = (state0, state0.f, jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32))
    st, _, cnt, it = jax.lax.while_loop(cond, body, init)
    return st, it, cnt >= conv_count


def tpgd_minimize(value_and_grad, x0, lr=0.1, ntol=1e-7, conv_count=3,
                  max_iter=1000, f_scale=1.0, skip_iters=2, apply_H0=None,
                  stop_fn=None, stag_k=6, axis_name=None):
    """Whole preconditioned two-point gradient descent as ONE XLA program.

    Steps ``x <- x - H M g`` where ``M`` is the (optional) spectral
    preconditioner and ``H`` the secant scale ``y.s / y.My`` from the last
    move — i.e. the BB2 step in the M-inner product.  NOTE: this is a
    deliberately different iteration from the reference's TPGD
    (two_point_gradient_descent.py:25-65 uses BB1, s.s/s.y); BB2 is the
    shorter, more conservative BB step and measured better under f32
    gradient noise with the exact preconditioner.  ``tpgd_step`` below is
    the faithful BB1 parity implementation.

    Rationale vs ``lbfgs_minimize`` on the f32 tier: near the minimum the
    L-BFGS curvature pairs (s, y) become f32-noise-dominated and poison the
    two-loop direction — the iterate then bounces at |dE| ~ 1e-4 eV forever
    and the dE stopping rule never fires.  The memoryless preconditioned
    iteration has no state to poison: with the exact uniform-density kernel
    it converges near-Newton fast for simple metals, and once steps fall
    below f32 resolution the iterate hits an exact fixed point (dE == 0),
    so the reference's dE criterion fires cleanly.  See
    docs/design.md for measurements.

    Same stopping rule as ``lbfgs_minimize`` with block=1: ``stop_var <
    ntol`` for ``conv_count`` consecutive iterations, checked after
    ``skip_iters`` iterations.  Returns (state, n_iters, converged).

    ``axis_name``: run SPMD inside ``shard_map`` — ``x0`` is the LOCAL
    shard of the flat variable, ``value_and_grad`` returns (global scalar,
    local gradient shard), and every inner product is psum'd over the
    named axis.  The whole while_loop then executes identically on every
    device with only scalar collectives added (the pencil-FFT distributed
    path, parallel/pfft.py).
    """
    f0, g0 = value_and_grad(x0)
    g0 = g0.reshape(-1)
    x0f = x0.reshape(-1)

    dt = x0f.dtype

    def cond(carry):
        st, cnt, it, damp, stag = carry
        return jnp.logical_and(cnt < conv_count, it < max_iter)

    def body(carry):
        st, cnt, it, damp, stag = carry
        st_new = tpgd_iteration(value_and_grad, st, lr, apply_H0=apply_H0,
                                scale=damp, axis_name=axis_name)
        # freeze converged lanes: under vmap (batched EOS volume scans) the
        # while_loop body keeps running until EVERY lane's cond is false, so
        # a converged lane must stop mutating or its noise bounce could
        # reset the counter and un-converge it
        done = cnt >= conv_count
        st_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(done, old, new), st_new, st)
        # stagnation-triggered damping: near the minimum, finite-precision
        # gradient error makes full BB steps bounce (|dE| plateaus above
        # ntol while E no longer decreases).  The bounce amplitude is
        # linear in the step scale, so after ``stag_k`` consecutive
        # non-decreasing energies we halve the scale — a few halvings force
        # the iterate onto its floating-point fixed point and the dE
        # stopping rule fires.  Genuine (non-monotone) BB progress rarely
        # fails to improve E ``stag_k`` times in a row, and damping only
        # ever shrinks steps near stationarity, so the fixed point is
        # unchanged.
        improved = st_new.f < st.f
        stag = jnp.where(improved, 0, stag + 1)
        trigger = stag >= stag_k
        damp = jnp.where(trigger, damp * 0.5, damp)
        stag = jnp.where(trigger, 0, stag)
        if stop_fn is None:
            stop_var = jnp.abs(st_new.f - st.f) * f_scale
        else:
            stop_var = stop_fn(st_new, st.f)
        hit = jnp.logical_and(it + 1 > skip_iters, stop_var < ntol)
        cnt = jnp.where(done, cnt, jnp.where(hit, cnt + 1, 0))
        return (st_new, cnt, jnp.where(done, it, it + 1), damp, stag)

    st0 = TPGDState(x=x0f, f=f0, g=g0, x_prev=x0f, g_prev=g0,
                    Mg_prev=jnp.zeros_like(g0),
                    n_iter=jnp.zeros((), jnp.int32))
    init = (st0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.ones((), dt), jnp.zeros((), jnp.int32))
    st, cnt, it, _, _ = jax.lax.while_loop(cond, body, init)
    return st, it, cnt >= conv_count


def tpgd_iteration(value_and_grad, st, lr, apply_H0=None, scale=1.0,
                   axis_name=None):
    """One (preconditioned) TPGD update — the steady-state hot-path step
    that ``tpgd_minimize`` loops; exposed for benchmarking/rooflining.
    ``scale`` damps the BB step (see tpgd_minimize's stagnation logic).

    The preconditioner is applied ONCE per iteration: M is linear (a
    spectral multiply), so M y = M g - M g_prev and the previous
    application is carried in the state (``Mg_prev``) — at 128^3 this
    removes 2 of the iteration's ~36 FFT transforms.

    ``axis_name``: SPMD mode (see tpgd_minimize) — inner products are
    psum'd over the named mesh axis.
    """
    if axis_name is None:
        pdot = jnp.dot
        psum1 = lambda v: jnp.sum(jnp.abs(v))
    else:
        pdot = lambda a, b: jax.lax.psum(jnp.dot(a, b), axis_name)
        psum1 = lambda v: jax.lax.psum(jnp.sum(jnp.abs(v)), axis_name)
    dt = st.x.dtype
    M = (lambda v: v) if apply_H0 is None else apply_H0
    first = st.n_iter == 0
    y = st.g - st.g_prev
    s = st.x - st.x_prev
    Mg = M(st.g)
    My = Mg - st.Mg_prev
    ys = pdot(y, s)
    yMy = pdot(y, My)
    # non-positive curvature (non-convex segment) or first move: fall back to
    # an lr-scaled step rather than a unit step, mirroring the reference
    # TPGD's safeguard (two_point_gradient_descent.py:25-65)
    H = jnp.where(jnp.logical_or(first, ys <= 0.0),
                  jnp.full((), lr, dt),
                  ys / jnp.where(yMy != 0, yMy, 1.0))
    d = -Mg
    # first step: gradient-magnitude-calibrated like the L-BFGS path
    t = jnp.where(first,
                  jnp.minimum(1.0, 1.0 / psum1(d)) * lr,
                  H * scale)
    x_new = st.x + t * d
    f_new, g_new = value_and_grad(x_new)
    return TPGDState(x=x_new, f=f_new, g=g_new.reshape(-1),
                     x_prev=st.x, g_prev=st.g, Mg_prev=Mg,
                     n_iter=st.n_iter + 1)


class TPGDState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    x_prev: jnp.ndarray
    g_prev: jnp.ndarray
    Mg_prev: jnp.ndarray    # preconditioned previous gradient (see iteration)
    n_iter: jnp.ndarray


def tpgd_init(value_and_grad, x0):
    f0, g0 = value_and_grad(x0)
    x = x0.reshape(-1)
    return TPGDState(x=x, f=f0, g=g0.reshape(-1), x_prev=x,
                     g_prev=jnp.zeros_like(x), Mg_prev=jnp.zeros_like(x),
                     n_iter=jnp.zeros((), jnp.int32))


def tpgd_step(value_and_grad, lr, state: TPGDState) -> TPGDState:
    """One Barzilai-Borwein / two-point gradient descent step
    (parity: two_point_gradient_descent.py:25-65)."""
    dx = state.x - state.x_prev
    dg = state.g - state.g_prev
    num = jnp.dot(dx, dx)
    den = jnp.dot(dx, dg)
    alpha = jnp.where(
        jnp.logical_or(state.n_iter == 0, den == 0.0), lr,
        jnp.where(num / jnp.where(den == 0, 1.0, den) <= 0.0, lr,
                  num / jnp.where(den == 0, 1.0, den)))
    x_new = state.x - alpha * state.g
    f_new, g_new = value_and_grad(x_new)
    return TPGDState(x=x_new, f=f_new, g=g_new.reshape(-1),
                     x_prev=state.x, g_prev=state.g,
                     Mg_prev=state.Mg_prev,  # unused by the BB1 parity path
                     n_iter=state.n_iter + 1)
