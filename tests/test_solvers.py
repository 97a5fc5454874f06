"""Unit tests for the jitted L-BFGS / TPGD solvers
(professad_tpu/ops/solvers.py; behavioral parity targets:
/root/reference/src/professad/_optimizers/)."""

import numpy as np
import jax
import jax.numpy as jnp

from professad_tpu.ops import solvers


def _quadratic(n=50, seed=0, cond=50.0):
    rng = np.random.default_rng(seed)
    Q = rng.normal(size=(n, n))
    Q, _ = np.linalg.qr(Q)
    eigs = np.geomspace(1.0, cond, n)
    A = jnp.asarray((Q * eigs) @ Q.T)
    b = jnp.asarray(rng.normal(size=n))
    x_star = jnp.linalg.solve(A, b)

    def vg(x):
        return jax.value_and_grad(lambda z: 0.5 * z @ A @ z - b @ z)(x)

    return vg, x_star


def test_lbfgs_iterations_converges_on_quadratic():
    vg, x_star = _quadratic()
    st = solvers.lbfgs_init(vg, jnp.zeros_like(x_star))
    step = jax.jit(lambda s: solvers.lbfgs_iterations(vg, s, 6, 1.0))
    for _ in range(30):
        st = step(st)
    assert np.allclose(np.asarray(st.x), np.asarray(x_star), atol=1e-6)


def test_lbfgs_memory_survives_single_iteration_calls():
    """Chained num_iters=1 calls must build curvature memory exactly like one
    num_iters=N call (regression: the g_prev carry used to reset per call,
    silently degrading to gradient descent)."""
    vg, x_star = _quadratic(n=20, seed=1)
    x0 = jnp.zeros_like(x_star)

    st6 = solvers.lbfgs_init(vg, x0)
    st6 = solvers.lbfgs_iterations(vg, st6, 12, 1.0)

    st1 = solvers.lbfgs_init(vg, x0)
    for _ in range(12):
        st1 = solvers.lbfgs_iterations(vg, st1, 1, 1.0)

    assert np.allclose(np.asarray(st1.x), np.asarray(st6.x), rtol=1e-12)
    assert np.allclose(np.asarray(st1.rho), np.asarray(st6.rho), rtol=1e-12)


def test_lbfgs_minimize_while_loop():
    vg, x_star = _quadratic(n=30, seed=2)
    st, n_it, conv = jax.jit(
        lambda x0: solvers.lbfgs_minimize(vg, x0, lr=1.0, ntol=1e-12,
                                          conv_count=3, max_iter=500)
    )(jnp.zeros_like(x_star))
    assert bool(conv)
    assert int(n_it) < 500
    assert np.allclose(np.asarray(st.x), np.asarray(x_star), atol=1e-5)


def test_lbfgs_preconditioner():
    """With M = A^-1 as the initial inverse Hessian, L-BFGS solves the
    quadratic near-immediately; and any SPD M must not change the fixed
    point."""
    vg, x_star = _quadratic(n=40, seed=4, cond=1000.0)
    rng = np.random.default_rng(4)
    Q = rng.normal(size=(40, 40))
    Q, _ = np.linalg.qr(Q)
    eigs = np.geomspace(1.0, 1000.0, 40)
    A = jnp.asarray((Q * eigs) @ Q.T)
    A_inv = jnp.linalg.inv(A)

    def apply_H0(q):
        return A_inv @ q

    st = solvers.lbfgs_init(vg, jnp.zeros(40))
    st = solvers.lbfgs_iterations(vg, st, 6, 1.0, apply_H0=apply_H0)
    assert np.allclose(np.asarray(st.x), np.asarray(x_star), atol=1e-8)

    # ill-conditioned problem without preconditioner needs far more work
    st_p = solvers.lbfgs_init(vg, jnp.zeros(40))
    st_p = solvers.lbfgs_iterations(vg, st_p, 6, 1.0)
    err_plain = np.max(np.abs(np.asarray(st_p.x - x_star)))
    err_pc = np.max(np.abs(np.asarray(st.x - x_star)))
    assert err_pc < err_plain * 1e-3


def test_tpgd_converges_on_quadratic():
    vg, x_star = _quadratic(n=20, seed=3, cond=10.0)
    st = solvers.tpgd_init(vg, jnp.zeros_like(x_star))
    step = jax.jit(lambda s: solvers.tpgd_step(vg, 0.05, s))
    for _ in range(300):
        st = step(st)
    assert np.allclose(np.asarray(st.x), np.asarray(x_star), atol=1e-6)


def test_tpgd_minimize_returns_best_iterate():
    """track_best: the BB trajectory is non-monotone, so the final iterate
    can sit above an already-visited point (observed 3.8e-7 eV on the f64
    HC tier).  With an overshooting first step (fallback lr scaled by the
    1/|d|_1 cap), the initial point IS the best after one iteration —
    track_best must return it; track_best=False returns the worse final
    iterate."""
    A = jnp.asarray(np.diag([1.0, 4.0]))

    def vg(x):
        return 0.5 * x @ (A @ x), A @ x

    x0 = jnp.asarray([1.0, 1.0])
    f0 = float(vg(x0)[0])
    st_b, it, conv = solvers.tpgd_minimize(vg, x0, lr=400.0, ntol=1e-30,
                                           conv_count=3, max_iter=1,
                                           track_best=True)
    st_f, _, _ = solvers.tpgd_minimize(vg, x0, lr=400.0, ntol=1e-30,
                                       conv_count=3, max_iter=1,
                                       track_best=False)
    assert float(st_f.f) > f0            # the raw step overshot
    assert float(st_b.f) == f0           # best-seen returned instead
    assert np.allclose(np.asarray(st_b.x), np.asarray(x0))
