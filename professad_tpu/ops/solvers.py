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

SHAPE-PRESERVING: the variable ``x`` keeps whatever shape the caller hands
in (3-D density grids stay 3-D; inner products are elementwise
multiply+sum, not flat dots).  This is a TPU layout requirement, not
cosmetics: carrying the 512^3 grid FLAT through the while loop makes XLA
fuse the flat->3-D reshape into the FFT's internal 4-D stage reshape,
whose chosen layout tiles a length-4 minor dimension to 128 — ONE 16 GB
scratch buffer for a 512 MB array (32x padding), the difference between
512^3 fitting a 16 GB chip or not.  With a naturally-shaped 3-D carry the
same program's FFT scratch is 1.5 GB.
"""

from typing import NamedTuple, Callable

import jax
import jax.numpy as jnp

__all__ = ["LBFGSState", "lbfgs_init", "lbfgs_iterations", "lbfgs_minimize",
           "TPGDState", "tpgd_init", "tpgd_step", "tpgd_minimize",
           "tpgd_iteration"]


class LBFGSState(NamedTuple):
    x: jnp.ndarray          # parameter array (caller's shape, preserved)
    f: jnp.ndarray          # scalar objective
    g: jnp.ndarray          # gradient, shaped like x
    g_prev: jnp.ndarray     # gradient before the last move (for y = g - g_prev)
    S: jnp.ndarray          # (history, *x.shape) step ring buffer
    Y: jnp.ndarray          # (history, *x.shape) grad-diff ring buffer
    rho: jnp.ndarray        # (history,) 1/(y.s); 0 marks an empty slot
    H_diag: jnp.ndarray     # scalar initial inverse-Hessian scale
    t_prev: jnp.ndarray     # last step size taken
    d_prev: jnp.ndarray     # last direction taken
    n_iter: jnp.ndarray     # total L-BFGS iterations so far (int32)


def lbfgs_init(value_and_grad, x0, history=8):
    f0, g0 = value_and_grad(x0)
    dt = x0.dtype
    g0 = g0.reshape(x0.shape)
    return LBFGSState(
        x=x0, f=f0, g=g0, g_prev=g0,
        S=jnp.zeros((history,) + x0.shape, dt),
        Y=jnp.zeros((history,) + x0.shape, dt),
        rho=jnp.zeros((history,), dt), H_diag=jnp.ones((), dt),
        t_prev=jnp.zeros((), dt), d_prev=jnp.zeros_like(x0),
        n_iter=jnp.zeros((), jnp.int32),
    )


def _pdot(axis_name):
    """Inner product over arbitrarily-shaped operands (elementwise
    multiply + full sum — no flattening reshape; see module docstring),
    psum'd over a mesh axis in SPMD (shard_map) mode."""
    if axis_name is None:
        return lambda a, b: jnp.sum(a * b)
    return lambda a, b: jax.lax.psum(jnp.sum(a * b), axis_name)


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
        return LBFGSState(x=x_new, f=f_new, g=g_new.reshape(st.x.shape),
                          g_prev=st.g,
                          S=S_new, Y=Y_new, rho=rho_new, H_diag=H_new,
                          t_prev=t, d_prev=d, n_iter=st.n_iter + 1)

    return jax.lax.fori_loop(0, num_iters, body, state)


def lbfgs_minimize(value_and_grad, x0, lr=0.1, ntol=1e-7, conv_count=3,
                   max_iter=1000, history=8, f_scale=1.0, skip_iters=5,
                   apply_H0=None, block=6, stop_fn=None, axis_name=None,
                   freeze_lanes=True):
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
        # reset the counter and un-converge it (same as tpgd_minimize;
        # ``freeze_lanes=False`` for single-system programs saves the
        # double-live state at peak memory)
        done = cnt >= conv_count
        if freeze_lanes:
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
                  stop_fn=None, stag_k=6, axis_name=None, freeze_lanes=True,
                  track_best=True):
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

    ``track_best=True`` (default) carries the lowest-energy iterate seen
    and returns IT instead of the final iterate.  The BB trajectory is
    non-monotone: measured on the f64 Huang-Carter tier, a >= ``stag_k``
    iteration upward excursion triggers stagnation damping mid-excursion
    and the dE rule then fires at the frozen point — 3.8e-7 eV ABOVE a
    previously visited iterate.  With best-tracking, premature damping
    costs extra iterations, never accuracy.  The returned state's ``g``
    (and BB memory) still belong to the LAST iterate — callers use
    ``state.x``/``state.f`` only after convergence.  Cost: one extra
    grid-sized carry buffer + a select per iteration; disable for
    memory-critical single-chip runs at the largest grids.
    """
    f0, g0 = value_and_grad(x0)
    g0 = g0.reshape(x0.shape)

    dt = x0.dtype

    def cond(carry):
        st, cnt, it, damp, stag, f_best, x_best = carry
        return jnp.logical_and(cnt < conv_count, it < max_iter)

    def body(carry):
        st, cnt, it, damp, stag, f_best, x_best = carry
        st_new = tpgd_iteration(value_and_grad, st, lr, apply_H0=apply_H0,
                                scale=damp, axis_name=axis_name)
        # freeze converged lanes: under vmap (batched EOS volume scans) the
        # while_loop body keeps running until EVERY lane's cond is false, so
        # a converged lane must stop mutating or its noise bounce could
        # reset the counter and un-converge it.  ``freeze_lanes=False``
        # (single-system whole-opt programs, where the loop exits the
        # moment cond fails) skips the select — it forces the ENTIRE old
        # state to stay live across the body, ~2 extra grid-sized buffers
        # at peak (the difference between fitting 512^3 on one chip or not)
        done = cnt >= conv_count
        if freeze_lanes:
            st_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(done, old, new), st_new, st)
        # stagnation-triggered damping: near the minimum, finite-precision
        # gradient error makes full BB steps bounce (|dE| plateaus above
        # ntol while E no longer decreases).  The bounce amplitude is
        # linear in the step scale, so after ``stag_k`` consecutive
        # iterations without MEANINGFUL progress we halve the scale — a few
        # halvings force the iterate onto its floating-point fixed point
        # and the dE stopping rule fires.  "Meaningful" = a new BEST-SO-FAR
        # energy, by more than the dtype's own energy resolution
        # (8 eps |f|).  Both weaker tests fail at large f32 grids where
        # the noise bounce (~1e-6 Ha = ~7 eps|f| at 256^3) dwarfs any
        # fixed tolerance: a strict ``f_new < f_prev`` test resets the
        # counter on ~half of all bounce iterations, and a
        # previous-iterate threshold test resets whenever the bounce dips
        # by more than the threshold — both postpone damping until a LUCKY
        # run of ``stag_k`` non-improving iterations (measured
        # 63..588-iteration spread at 256^3 on identical inputs; the
        # backend is not run-to-run deterministic at f32 rounding level).
        # Records of a stationary noise walk, by contrast, become rare
        # quickly — and every halving shrinks the bounce, so beating the
        # deepest dip of the LARGER earlier bounce stops happening at all:
        # damping is self-reinforcing and the iteration count becomes
        # deterministic.  The threshold must be NOISE-scaled, not
        # ntol-scaled: on the f64 tiers 8 eps|f| ~ 2e-16 Ha, so any
        # genuine tail progress keeps resetting the counter and damping
        # cannot preempt the dE stopping rule during slow non-monotone BB
        # phases (measured on the f64 HC tier: results are identical with
        # damping disabled entirely).  Real descent sets a new best nearly
        # every iteration (the preconditioned BB2 step is near-Newton and
        # close to monotone), so genuine progress — including HC's
        # ~190-iteration trajectories — is not damped prematurely, and
        # damping only ever shrinks steps near stationarity, so the fixed
        # point is unchanged.
        tol_stag = 8.0 * jnp.finfo(dt).eps * jnp.maximum(jnp.abs(f_best), 1.0)
        improved = f_best - st_new.f > tol_stag
        if track_best:
            x_best = jnp.where(st_new.f < f_best, st_new.x, x_best)
        f_best = jnp.minimum(f_best, st_new.f)
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
        return (st_new, cnt, jnp.where(done, it, it + 1), damp, stag,
                f_best, x_best)

    st0 = TPGDState(x=x0, f=f0, g=g0, g_prev=g0,
                    Mg_prev=jnp.zeros_like(g0),
                    s_prev=jnp.zeros_like(g0),
                    n_iter=jnp.zeros((), jnp.int32))
    # track_best=False carries a dummy scalar so the loop signature is one
    # program either way (XLA folds the unused select away)
    xb0 = x0 if track_best else jnp.zeros((), dt)
    init = (st0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.ones((), dt), jnp.zeros((), jnp.int32), f0, xb0)
    st, cnt, it, _, _, f_best, x_best = jax.lax.while_loop(cond, body, init)
    if track_best:
        take = f_best < st.f
        st = st._replace(x=jnp.where(take, x_best, st.x),
                         f=jnp.where(take, f_best, st.f))
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

    Memory note: the state carries the last move ``s_prev = fl(x_new) -
    fl(x_old)`` instead of ``x_prev``.  The value is bit-identical to the
    classical ``x - x_prev`` (computed in the body where both operands are
    live), but the OLD ``x`` can die before the energy+gradient evaluation
    instead of surviving the whole body as a carry element — one fewer
    grid-sized buffer at peak (512 MB at 512^3 f32).  The exactness
    matters: reconstructing ``s = -t * Mg_prev`` algebraically (measured)
    doubles the f32 iteration count at 256^3 — near the fixed point the
    stored difference hits exact zero (Sterbenz) and triggers the lr
    fallback, while the reconstruction keeps feeding noise-level
    curvature into the BB step.
    """
    pdot = _pdot(axis_name)
    if axis_name is None:
        psum1 = lambda v: jnp.sum(jnp.abs(v))
    else:
        psum1 = lambda v: jax.lax.psum(jnp.sum(jnp.abs(v)), axis_name)
    dt = st.x.dtype
    M = (lambda v: v) if apply_H0 is None else apply_H0
    first = st.n_iter == 0
    y = st.g - st.g_prev
    s = st.s_prev
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
    s_new = x_new - st.x      # exact stored difference; frees old x early
    f_new, g_new = value_and_grad(x_new)
    return TPGDState(x=x_new, f=f_new, g=g_new.reshape(st.x.shape),
                     g_prev=st.g, Mg_prev=Mg, s_prev=s_new,
                     n_iter=st.n_iter + 1)


class TPGDState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    g_prev: jnp.ndarray
    Mg_prev: jnp.ndarray    # preconditioned previous gradient (see iteration)
    s_prev: jnp.ndarray     # the last move, fl(x_new) - fl(x_old)
    n_iter: jnp.ndarray


def tpgd_init(value_and_grad, x0):
    f0, g0 = value_and_grad(x0)
    return TPGDState(x=x0, f=f0, g=g0.reshape(x0.shape),
                     g_prev=jnp.zeros_like(x0), Mg_prev=jnp.zeros_like(x0),
                     s_prev=jnp.zeros_like(x0),
                     n_iter=jnp.zeros((), jnp.int32))


def tpgd_step(value_and_grad, lr, state: TPGDState) -> TPGDState:
    """One Barzilai-Borwein / two-point gradient descent step
    (parity: two_point_gradient_descent.py:25-65).  ``s_prev`` carries the
    exact stored difference of the last move (see ``tpgd_iteration``)."""
    dx = state.s_prev
    dg = state.g - state.g_prev
    num = jnp.sum(dx * dx)
    den = jnp.sum(dx * dg)
    alpha = jnp.where(
        jnp.logical_or(state.n_iter == 0, den == 0.0), lr,
        jnp.where(num / jnp.where(den == 0, 1.0, den) <= 0.0, lr,
                  num / jnp.where(den == 0, 1.0, den)))
    x_new = state.x - alpha * state.g
    f_new, g_new = value_and_grad(x_new)
    return TPGDState(x=x_new, f=f_new, g=g_new.reshape(state.x.shape),
                     g_prev=state.g,
                     Mg_prev=state.Mg_prev,  # unused by the BB1 parity path
                     s_prev=x_new - state.x,
                     n_iter=state.n_iter + 1)
