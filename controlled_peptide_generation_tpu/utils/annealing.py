"""Scalar schedules (reference: utils.py:51-66).

Work both on host (plain floats) and inside jit (traced scalars): the clamp
is expressed arithmetically instead of with Python branches on the iter.
"""


def interpolate(start_val, end_val, start_iter, end_iter, current_iter):
    """Linear ramp from start_val to end_val between start_iter/end_iter."""
    span = end_iter - start_iter
    if span <= 0:
        span = 1
    frac = (current_iter - start_iter) / span
    if hasattr(frac, "shape"):  # traced / array value
        import jax.numpy as jnp
        frac = jnp.clip(frac, 0.0, 1.0)
    else:
        frac = min(max(frac, 0.0), 1.0)
    return start_val + (end_val - start_val) * frac


def anneal(sched, it):
    """Evaluate a {start:{val,iter}, end:{val,iter}} schedule Bunch at it."""
    return interpolate(sched.start.val, sched.end.val,
                       sched.start.iter, sched.end.iter, it)
