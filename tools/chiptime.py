"""Trustworthy kernel timing on the axon tunnel platform.

jax.block_until_ready is unreliable here (returns before compute
finishes; only host materialization syncs), and one host round trip
costs ~50 ms. So: run the op K times inside ONE jitted fori_loop with
a data-dependent carry, reduce to a scalar, materialize 4 bytes, and
subtract the measured empty-loop baseline. cost = (T_K - T_0) / K.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    acc = jnp.int32(0)
    for leaf in leaves:
        x = leaf
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.int32)
        acc = acc + jnp.sum(x.astype(jnp.int32) if x.dtype != jnp.int32
                            else x).astype(jnp.int32)
    return acc


def chiptime(fn, args, k: int = 8, reps: int = 3,
             perturb: int | None = 0) -> float:
    """Median ms per call of fn(*args) measured on device.

    perturb: index of the arg to vary per iteration (+ loop counter)
    so the compiler cannot hoist the body out of the loop; None if the
    body already depends on the carry.
    """

    def make(k_steps):
        def run(*a):
            def body(i, carry):
                aa = list(a)
                if perturb is not None:
                    aa[perturb] = aa[perturb] + (i - i // 2 * 2).astype(
                        aa[perturb].dtype)
                out = fn(*aa)
                return carry + _scalarize(out)
            return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))
        return jax.jit(run)

    f_k = make(k)
    f_0 = make(0)
    # compile + warm
    np.asarray(f_k(*args))
    np.asarray(f_0(*args))

    def med(f):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(*args))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    return (med(f_k) - med(f_0)) / k * 1000.0


def report(name: str, fn, args, k: int = 8, **kw) -> float:
    ms = chiptime(fn, args, k=k, **kw)
    print(f"{name:46s} {ms:8.2f} ms", flush=True)
    return ms
