"""Iterative solvers and spectral models built on the merge-path operator.

The reference is a kernel benchmark; the framework completes it into a
usable library by shipping the standard SpMV-driven algorithms — the
workloads CsrMV exists for.  Every solver is a pure jit-compatible function
over an ``SpmvOperator`` (ops/operator.py): the matrix stays device-resident,
iteration is ``lax.while_loop`` (no host round-trips, XLA-fusable vector
updates between SpMV calls).

    op = build_operator(csr)
    x, info = conjugate_gradient(op, b, tol=1e-6)
    lam, v, info = power_iteration(op)
    pr, info = pagerank(build_operator(csr_transposed_stochastic))

All solvers return (solution, info) with info = (iterations, residual).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["conjugate_gradient", "bicgstab", "jacobi", "power_iteration",
           "pagerank", "SolveInfo"]


class SolveInfo(NamedTuple):
    iterations: jnp.ndarray   # int32
    residual: jnp.ndarray     # float (final ||r|| or method-specific)


def _norm(v):
    return jnp.sqrt(jnp.sum(v * v))


def conjugate_gradient(op, b, x0=None, tol: float = 1e-6,
                       maxiter: int = 1000):
    """CG for symmetric positive-definite A (e.g. grid Laplacians).

    Standard Hestenes–Stiefel recurrence; one csrmv per iteration.
    """
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    r = b - op(x)
    p = r
    rs = jnp.sum(r * r)
    tol2 = jnp.asarray(tol, b.dtype) ** 2 * jnp.sum(b * b)

    def cond(state):
        _, _, _, rs, k = state
        return (rs > tol2) & (k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        ap = op(p)
        alpha = rs / jnp.sum(p * ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, k + 1

    x, r, p, rs, k = jax.lax.while_loop(cond, body, (x, r, p, rs, 0))
    return x, SolveInfo(k, jnp.sqrt(rs))


def bicgstab(op, b, x0=None, tol: float = 1e-6, maxiter: int = 1000):
    """BiCGSTAB for general (nonsymmetric) A — two csrmv per iteration."""
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    r = b - op(x)
    r_hat = r
    rho = alpha = omega = jnp.asarray(1.0, b.dtype)
    v = p = jnp.zeros_like(b)
    tol2 = jnp.asarray(tol, b.dtype) ** 2 * jnp.sum(b * b)

    def cond(state):
        x, r, *_ , k = state
        return (jnp.sum(r * r) > tol2) & (k < maxiter)

    def body(state):
        x, r, r_hat, rho, alpha, omega, v, p, k = state
        rho_new = jnp.sum(r_hat * r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        v = op(p)
        alpha = rho_new / jnp.sum(r_hat * v)
        s = r - alpha * v
        t = op(s)
        omega = jnp.sum(t * s) / jnp.sum(t * t)
        x = x + alpha * p + omega * s
        r = s - omega * t
        return x, r, r_hat, rho_new, alpha, omega, v, p, k + 1

    state = (x, r, r_hat, rho, alpha, omega, v, p, 0)
    x, r, *_, k = jax.lax.while_loop(cond, body, state)
    return x, SolveInfo(k, _norm(r))


def jacobi(op, diag, b, x0=None, tol: float = 1e-6, maxiter: int = 1000):
    """Jacobi iteration x <- x + D^-1 (b - A x); `diag` is A's diagonal."""
    b = jnp.asarray(b)
    inv_d = 1.0 / jnp.asarray(diag)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    tol2 = jnp.asarray(tol, b.dtype) ** 2 * jnp.sum(b * b)

    def cond(state):
        _, rs, k = state
        return (rs > tol2) & (k < maxiter)

    def body(state):
        x, _, k = state
        r = b - op(x)
        x = x + inv_d * r
        return x, jnp.sum(r * r), k + 1

    x, rs, k = jax.lax.while_loop(cond, body, (x, jnp.inf, 0))
    return x, SolveInfo(k, jnp.sqrt(rs))


def power_iteration(op, v0=None, tol: float = 1e-6, maxiter: int = 1000,
                    seed: int = 0):
    """Dominant eigenpair of A by normalized power iteration.

    Returns (eigenvalue, eigenvector, info).
    """
    n = op.plan.num_cols
    dtype = jnp.dtype(op.plan.dtype)
    if v0 is None:
        v = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype)
    else:
        v = jnp.asarray(v0)
    v = v / _norm(v)

    def cond(state):
        _, _, diff, k = state
        return (diff > tol) & (k < maxiter)

    def body(state):
        v, lam, _, k = state
        w = op(v)
        lam_new = jnp.sum(v * w)
        w_norm = _norm(w)
        v_new = w / jnp.where(w_norm > 0, w_norm, 1.0)
        return v_new, lam_new, jnp.abs(lam_new - lam), k + 1

    v, lam, diff, k = jax.lax.while_loop(
        cond, body, (v, jnp.asarray(0.0, dtype), jnp.asarray(jnp.inf, dtype), 0))
    return lam, v, SolveInfo(k, diff)


def pagerank(op, damping: float = 0.85, tol: float = 1e-8,
             maxiter: int = 200):
    """PageRank over a column-stochastic transition operator.

    ``op`` must apply P (out-degree-normalized adjacency transpose):
    pr <- damping * P pr + (1 - damping)/n.  Dangling mass is redistributed
    uniformly so the total stays 1.
    """
    n = op.plan.num_rows
    dtype = jnp.dtype(op.plan.dtype)
    pr = jnp.full((n,), 1.0 / n, dtype)
    teleport = jnp.asarray((1.0 - damping) / n, dtype)

    def cond(state):
        _, diff, k = state
        return (diff > tol) & (k < maxiter)

    def body(state):
        pr, _, k = state
        spread = op(pr)
        dangling = (1.0 - jnp.sum(spread)) / n     # mass lost to sinks
        new = damping * (spread + dangling) + teleport
        return new, jnp.sum(jnp.abs(new - pr)), k + 1

    pr, diff, k = jax.lax.while_loop(
        cond, body, (pr, jnp.asarray(jnp.inf, dtype), 0))
    return pr, SolveInfo(k, diff)
