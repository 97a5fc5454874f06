#!/usr/bin/env python
"""Headline benchmark: bulk-Al density optimization to convergence, 128^3.

The north-star target (BASELINE.json): fcc-Al density optimization on a
128^3 grid converged to dE < 1e-7 eV in under 2 s on one TPU chip.  This
measures exactly that: the whole optimization — preconditioned L-BFGS
iterations, convergence counter, stopping rule — runs as ONE XLA program
(`System.optimize_density(jit_loop=True, precondition=True)` internals) on
the f32 TPU fast path, with f64-accurate energy accumulation (`ops.grid
.qmean`) so the 1e-7 eV criterion is resolvable.

``vs_baseline`` = 2.0 s / measured time (>1 beats the target).

Prints ONE JSON line on stdout; diagnostics go to stderr.

Setup (recpot parsing, v_ext construction) runs host-side in f64 and is not
timed.  The first two calls absorb XLA compilation and the axon runtime's
per-signature executable deserialization (see docs/design.md); steady-state
timing starts after that.
"""

import json
import os
import sys
import time

import numpy as np

TARGET_SECONDS = 2.0  # north-star budget (BASELINE.json)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_system(shape):
    import jax.numpy as jnp
    from professad_tpu.system import System
    from professad_tpu.models import (IonIon, IonElectron, Hartree, WangTeter,
                                      PerdewBurkeErnzerhof)

    box_vecs = 4.050 * jnp.eye(3)
    frac = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                        [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    pot = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "potentials", "al.gga.recpot")
    ions = [["Al", pot, frac]]
    terms = [IonIon, IonElectron, Hartree, WangTeter, PerdewBurkeErnzerhof]
    return System(box_vecs, shape, ions, terms, units="a",
                  coord_type="fractional")


def main():
    import jax

    # persistent compilation cache: the axon remote-compile path is slow
    # (minutes per executable); cache hits make reruns start in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    backend = jax.default_backend()
    n = int(os.environ.get("BENCH_GRID", 128 if backend != "cpu" else 48))
    shape = (n, n, n)
    dtype = jnp.float32 if backend != "cpu" else jnp.float64
    ntol = 1e-7   # eV, reference criterion (3 consecutive hits)
    trials = int(os.environ.get("BENCH_TRIALS", 3))

    log(f"[bench] backend={backend} grid={n}^3 dtype={dtype.__name__} "
        f"ntol={ntol} eV")

    # ---- setup (host-side, f64, untimed) --------------------------------
    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        system = build_system(shape)
        box_np = np.asarray(system._box_vecs)
        v_ext_np = np.asarray(system._v_ext)
        den_np = np.asarray(system.density())
    N_elec = float(system._N_elec)
    log(f"[bench] setup done in {time.perf_counter() - t0:.1f}s "
        f"(N_elec={N_elec})")

    dev = jax.devices()[0]
    box_vecs = jax.device_put(jnp.asarray(box_np, dtype), dev)
    v_ext = jax.device_put(jnp.asarray(v_ext_np, dtype), dev)
    chi0 = jax.device_put(jnp.asarray(np.sqrt(den_np).reshape(-1), dtype), dev)

    def full(chi0, box_vecs, v_ext, N_elec, lr, ntol, cc, mi):
        # whole optimization as one XLA program, preconditioned
        return system._jit_lbfgs_full(chi0, box_vecs, v_ext, N_elec, lr,
                                      ntol, cc, mi, precondition=True)

    # ---- compile + warm (untimed) ----------------------------------------
    t0 = time.perf_counter()
    st, n_it, conv = full(chi0, box_vecs, v_ext, N_elec, 0.1, ntol, 3, 1000)
    jax.block_until_ready(st.x)
    log(f"[bench] compile+first call {time.perf_counter() - t0:.1f}s: "
        f"{int(n_it)} iters, converged={bool(conv)}, E={float(st.f):.9f} Ha")

    # ---- timed full optimizations from the uniform start ------------------
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        st, n_it, conv = full(chi0, box_vecs, v_ext, N_elec, 0.1, ntol, 3,
                              1000)
        jax.block_until_ready(st.x)
        times.append(time.perf_counter() - t0)
    t_best = min(times)

    eV = 27.211386245988
    n_atoms = 4
    log(f"[bench] times={['%.3f' % t for t in times]}s, iters={int(n_it)}, "
        f"converged={bool(conv)}, E={float(st.f) * eV / n_atoms:.6f} eV/atom "
        f"(density terms), {int(n_it) / t_best:.1f} iters/s")

    if not bool(conv):
        log("[bench] WARNING: did not converge within 1000 iterations")

    result = {
        "metric": f"time_to_converge_dE1e-7eV_fccAl_{n}c3_WT_PBE",
        "value": round(t_best, 3),
        "unit": "s",
        "vs_baseline": round(TARGET_SECONDS / t_best, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
