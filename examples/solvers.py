"""Iterative solvers on top of the handle API — the execute-many story.

The reference's vestigial ITSOL heritage (src/samples/data-types.h:30-302
declares FGMRES/BiCGSTAB structs nothing uses) points at the intended
workload: Krylov solvers calling SpMV hundreds of times per matrix.  These
examples show the inspect-once/execute-many contract doing that work on TPU:
the handle compiles once, every iteration is a device-side call, and the
whole solver loop can live under one ``lax.while_loop``.

Run:  python examples/solvers.py
"""

import os
import sys

# allow `python examples/<name>.py` without installing the package
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import spmv_tpu as st


def conjugate_gradient(h: st.SpmvHandle, b, tol=1e-6, maxiter=500):
    """CG for SPD A, entirely on device (one jitted while_loop)."""
    spmv = h._bound

    def body(state):
        x, r, p, rs, it = state
        ap = spmv(p)
        alpha = rs / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, it + 1

    def cond(state):
        _, _, _, rs, it = state
        return jnp.logical_and(rs > tol * tol, it < maxiter)

    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b)
    r0 = b
    state = (x0, r0, r0, jnp.vdot(r0, r0), jnp.asarray(0))
    x, r, _, rs, iters = jax.lax.while_loop(cond, body, state)
    return x, float(jnp.sqrt(rs)), int(iters)


def power_iteration(h: st.SpmvHandle, iters=100, seed=0):
    """Dominant eigenvalue of A via repeated SpMV."""
    spmv = h._bound
    v = jnp.asarray(np.random.default_rng(seed).standard_normal(h.n)
                    .astype(np.float32 if h.dtype == np.float32
                            else np.float64))

    def body(i, v):
        w = spmv(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v / jnp.linalg.norm(v))
    lam = jnp.vdot(v, spmv(v))
    return float(lam), v


def main():
    import jax
    from spmv_tpu.io import generate

    # SPD system: diagonally dominant random matrix.  f32 on TPU (f64 is
    # software-emulated there); f64 elsewhere.
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    a = generate.diag_plus_random(5000, nnz_per_row=8, seed=1).astype(dtype)
    sym = st.CsrMatrix.from_coo(  # symmetrize: A + A^T
        a.m, a.n,
        np.concatenate([np.repeat(np.arange(a.m), a.row_lengths), a.colidx]),
        np.concatenate([a.colidx, np.repeat(np.arange(a.m), a.row_lengths)]),
        np.concatenate([a.vals, a.vals]) * 0.5)
    h = st.create_handle(sym)
    b = np.random.default_rng(2).standard_normal(sym.n)
    b = b.astype(dtype)
    x, res, iters = conjugate_gradient(h, b, tol=1e-5 if dtype == np.float32 else 1e-6)
    print(f"CG: method={h.method_name}, {iters} iterations, "
          f"residual {res:.2e}")
    check = np.asarray(st.spmv(h, x)) - np.asarray(b)
    print(f"   |Ax-b| = {np.abs(check).max():.2e}")

    lam, _ = power_iteration(h, iters=50)
    print(f"power iteration: lambda_max ~ {lam:.4f}")


if __name__ == "__main__":
    main()
