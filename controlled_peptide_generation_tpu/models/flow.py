"""Normalizing-flow priors on z: planar / radial / alternating.

Reference: models/flow.py. Behavioral deviations, by design (SURVEY.md §2.13):

* invertibility is enforced *functionally* — the constrained scale
  (planar u_hat) / beta (radial) are computed from the raw parameters at
  every application, instead of the reference's conditional in-place data
  surgery on .data (flow.py:46-49, 81-82). Where the reference constraint is
  inactive (margin >= -1), the two coincide exactly.
* (z, sum log|det J|) is always returned; there is no train/eval return-type
  switch and no ``z.flowed`` attribute tagging.

Per-layer transforms and log-det formulas match the reference:
planar: z' = z + u * tanh(w.z + b),     logdet = log|1 + psi.u|
radial: z' = z + beta*h(a,r)*(z - z0),  h = 1/(a + r)
"""

import jax
import jax.numpy as jnp

EPS = 1e-7  # reference's numerical-stability epsilon (flow.py:57)


def init(key, flow_type, n_layers, z_dim):
    """One param dict per layer; both families allocated for 'alternating'
    (the reference allocates both too, flow.py:110-123)."""
    keys = jax.random.split(key, 6)
    u = jax.random.uniform

    def planar(i):
        return {
            "w": u(keys[0], (n_layers, z_dim), minval=-0.01, maxval=0.01),
            "b": u(keys[1], (n_layers,), minval=-0.01, maxval=0.01),
            "scale": u(keys[2], (n_layers, z_dim), minval=-0.01, maxval=0.01),
        }

    def radial(i):
        return {
            "z0": u(keys[3], (n_layers, z_dim), minval=-0.01, maxval=0.01),
            "alpha": u(keys[4], (n_layers,), minval=0.01, maxval=1.0),
            "beta": u(keys[5], (n_layers,), minval=-0.01, maxval=0.01),
        }

    if flow_type == "planar":
        return {"planar": planar(0)}
    if flow_type == "radial":
        return {"radial": radial(0)}
    if flow_type == "alternating":
        return {"planar": planar(0), "radial": radial(0)}
    raise ValueError("Please use planar, radial, or alternating flow.")


def _planar_constrained_scale(w, scale):
    """Project scale so that scale.w >= -1 (invertibility), functionally."""
    margin = jnp.dot(scale, w)
    correction = (-1.0 + jnp.log1p(jnp.exp(margin)) - margin)
    needs = margin < -1.0
    w_unit = w / (jnp.linalg.norm(w) + EPS)
    return jnp.where(needs, scale + correction * w_unit, scale)


def _planar_step(z, w, b, scale):
    scale = _planar_constrained_scale(w, scale)
    act = jnp.tanh(z @ w + b)                       # [B]
    z_new = z + scale[None, :] * act[:, None]
    psi = (1.0 - act ** 2)[:, None] * w[None, :]    # [B, D]
    det = 1.0 + psi @ scale
    logdet = jnp.log(jnp.abs(det) + EPS)
    return z_new, logdet


def _radial_constrained_beta(alpha, beta):
    return jnp.where(beta < -alpha, -alpha + jnp.log1p(jnp.exp(beta)), beta)


def _radial_step(z, z0, alpha, beta, z_dim):
    beta = _radial_constrained_beta(alpha, beta)
    radius = z - z0[None, :]
    r = jnp.linalg.norm(radius, axis=1)             # [B]
    h = 1.0 / (alpha + r)
    z_new = z + beta * h[:, None] * radius
    bh = beta * h
    det = (1.0 + bh) ** (z_dim - 1) * (1.0 + bh + beta * (-h ** 2) * r)
    logdet = jnp.log(jnp.abs(det) + EPS)
    return z_new, logdet


def apply(params, flow_type, z):
    """z: [B, D] -> (z_K [B, D], sum-of-logdets [B])."""
    z_dim = z.shape[1]
    logdet = jnp.zeros(z.shape[0], z.dtype)
    for i in range(_n_layers(params)):
        if flow_type == "planar" or (flow_type == "alternating"
                                     and i % 2 == 0):
            p = params["planar"]
            z, ld = _planar_step(z, p["w"][i], p["b"][i], p["scale"][i])
        else:
            p = params["radial"]
            z, ld = _radial_step(z, p["z0"][i], p["alpha"][i], p["beta"][i],
                                 z_dim)
        logdet = logdet + ld
    return z, logdet


def _n_layers(params):
    if "planar" in params:
        return params["planar"]["b"].shape[0]
    return params["radial"]["alpha"].shape[0]
