"""In-graph timing harness for TPU micro-benchmarks through the axon
tunnel.

Chained host-side calls cannot amortize the per-dispatch issue cost
(~3-6 ms/call measured via a no-op pallas kernel —
tools/profile_roialign_steps.py), so per-op times below ~6 ms are
invisible to call-chained timing. This harness runs K iterations inside
ONE jit via ``lax.fori_loop`` with a carry-perturbed input (defeats CSE/
hoisting) and subtracts a measured empty-loop baseline dispatch.
"""
import time

import jax
import jax.numpy as jnp


def device_time(op, args, iters: int = 32, reps: int = 3,
                perturb=None):
    """Median per-iteration device time of ``op(*args)`` in ms.

    op must map perturbed args -> array(s); the carry folds a scalar
    from the output back into the next iteration's input so the loop
    is sequential on device.

    perturb: fn(args, eps_scalar) -> new args; default adds
    ``eps * 1e-9`` to the first arg.
    """
    if perturb is None:
        def perturb(a, eps):
            return (a[0] + eps * 1e-9,) + tuple(a[1:])

    @jax.jit
    def looped(c0, *a):
        def body(_, c):
            out = op(*perturb(a, c))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) * 1e-9
                    for l in leaves)
            return c + s
        return jax.lax.fori_loop(0, iters, body, c0)

    @jax.jit
    def empty(c0):
        return c0 + 1.0

    # compile both
    float(looped(jnp.zeros(()), *args))
    float(empty(jnp.zeros(())))

    def run(fn, *a):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(jnp.zeros(()), *a))
            best = min(best, time.perf_counter() - t0)
        return best

    base = run(empty)
    total = run(looped, *args)
    return max(total - base, 0.0) / iters * 1000.0
