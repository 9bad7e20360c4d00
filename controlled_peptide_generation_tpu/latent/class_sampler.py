"""CLaSS rejection sampling as one fused device program.

Reference flow (density_modeling.py:50-60 + sample_pipeline.py:196-208):
draw z ~ Q on host with numpy, score each sklearn classifier, multiply
probabilities, accept where U < prod. Here the GMM draw, every logistic
head, the probability product and the acceptance test fuse into a single
jitted XLA program vmapped over the whole candidate batch — a million
latents per launch is a few [N,D]x[D,K] matmuls.
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import gmm as gmm_mod


@partial(jax.jit, static_argnames=("kind", "n"))
def _rejection_round(key, kind, q_params, clf_w, clf_b, targets, n):
    kz, ku = jax.random.split(key)
    cov_type = kind.split("_", 1)[1]
    z = gmm_mod.sample(kz, q_params, n, cov_type)
    # all attribute heads at once: [n, A]
    p1 = jax.nn.sigmoid(z @ clf_w.T + clf_b[None, :])
    probs = jnp.where(targets[None, :] == 1, p1, 1.0 - p1)
    accum = jnp.prod(probs, axis=1)
    accept = jax.random.uniform(ku, (n,)) < accum
    return z, probs, accum, accept


def rejection_round(key, sampler, clf_w, clf_b, targets, n):
    """sampler: ('gmm_diag'|'gmm_full', GMMParams)."""
    kind, q_params = sampler
    return _rejection_round(key, kind, q_params, clf_w, clf_b, targets, n)


def accepted_z(z, accept, max_accepted):
    """Gather up to max_accepted accepted rows into a fixed-shape buffer
    (device-side compaction; count returned separately)."""
    idx = jnp.nonzero(accept, size=max_accepted, fill_value=0)[0]
    count = jnp.minimum(jnp.sum(accept), max_accepted)
    return z[idx], count
