#!/usr/bin/env python
"""Headline benchmark: bulk-Al density-optimization throughput, 128^3 grid.

Measures L-BFGS density-optimization iterations/second for fcc-Al (4-atom
conventional cell, a = 4.05 A) with WangTeter + PBE on a 128^3 grid — the
reference's hot path (/root/reference/src/professad/system.py:774-908) at the
BASELINE.json north-star configuration.  Each iteration is one forward
(all FFT convolutions of every energy term) + one reverse pass through them.

Baseline: the north-star target is full convergence (~26 L-BFGS iterations,
cf. reference docs/source/example_density_optimization.rst:78-105) in < 2 s
on one TPU chip => 13 iterations/s.  ``vs_baseline`` = measured / 13.

Prints ONE JSON line on stdout; all diagnostics go to stderr.

Precision: f32 on TPU (TPU has no native f64 FFT; the correctness tier runs
the full test suite in f64 on CPU), f64 on CPU fallback.  Setup (recpot
parsing, v_ext construction) runs host-side in f64 and is not timed.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 13.0  # 26 iterations in < 2 s (BASELINE.json)


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
    from professad_tpu.ops import solvers

    backend = jax.default_backend()
    n = int(os.environ.get("BENCH_GRID", 128 if backend != "cpu" else 64))
    shape = (n, n, n)
    dtype = jnp.float32 if backend != "cpu" else jnp.float64
    outer_steps = int(os.environ.get("BENCH_STEPS", 5))
    inner_iters = 6
    lr = 0.1

    log(f"[bench] backend={backend} grid={n}^3 dtype={dtype.__name__} "
        f"steps={outer_steps}x{inner_iters}")

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

    # NOTE: big arrays (v_ext, box) MUST be jit ARGUMENTS, not closure
    # captures — closed-over device arrays become executable constants,
    # which the axon remote runtime re-ships on every call (measured 6x
    # slowdown on the whole step).
    def vg(chi_flat):
        return jax.value_and_grad(system._chi_energy)(
            chi_flat, box_vecs, v_ext, N_elec)

    @jax.jit
    def step(st, box_vecs, v_ext):
        vg_ = lambda x: jax.value_and_grad(system._chi_energy)(
            x, box_vecs, v_ext, N_elec)
        return solvers.lbfgs_iterations(vg_, st, inner_iters, lr)

    # ---- compile + warm (untimed) ----------------------------------------
    # two warmup calls: the axon runtime deserializes the cached executable
    # on the first in-memory cache miss of EACH call signature (~30-90 s);
    # steady state is reached from the second step call onward.
    t0 = time.perf_counter()
    state = solvers.lbfgs_init(vg, chi0)
    state = step(state, box_vecs, v_ext)
    jax.block_until_ready(state.x)
    log(f"[bench] compile+first step in {time.perf_counter() - t0:.1f}s, "
        f"E={float(state.f):.6f} Ha")
    t0 = time.perf_counter()
    state = step(state, box_vecs, v_ext)
    jax.block_until_ready(state.x)
    log(f"[bench] second (warm) step in {time.perf_counter() - t0:.1f}s")

    # ---- timed steps -----------------------------------------------------
    E_prev = float(state.f)
    t0 = time.perf_counter()
    for i in range(outer_steps):
        state = step(state, box_vecs, v_ext)
    jax.block_until_ready(state.x)
    elapsed = time.perf_counter() - t0

    E = float(state.f)
    eV = 27.211386245988
    log(f"[bench] {outer_steps * inner_iters} iters in {elapsed:.3f}s; "
        f"E={E * eV / 4:.6f} eV/atom, dE={abs(E - E_prev) * eV:.3e} eV")

    iters_per_sec = outer_steps * inner_iters / elapsed
    result = {
        "metric": f"lbfgs_density_opt_iters_per_sec_fccAl_{n}c3_WT_PBE",
        "value": round(iters_per_sec, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
