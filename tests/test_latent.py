"""Latent stack vs sklearn/scipy: GMM-EM, logistic regression, Q models,
rejection sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick
from sklearn.linear_model import LogisticRegression
from sklearn.mixture import GaussianMixture
import scipy.stats

from controlled_peptide_generation_tpu.latent import (
    gmm, logreg, density, class_sampler)


def synth_mixture(seed=0, n=1200, d=6, k=3):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=4.0, size=(k, d))
    X = np.concatenate([
        means[i] + rng.normal(scale=0.7, size=(n // k, d))
        for i in range(k)]).astype(np.float32)
    rng.shuffle(X)
    return X


def test_gmm_em_matches_sklearn_nll():
    X = synth_mixture()
    params, info = gmm.fit(jax.random.PRNGKey(0), jnp.asarray(X), 3,
                           covariance_type="diag")
    sk = GaussianMixture(3, covariance_type="diag", random_state=0).fit(X)
    ours = float(gmm.score(params, jnp.asarray(X), "diag"))
    theirs = sk.score(X)
    assert bool(info.converged)
    assert abs(ours - theirs) < 0.05, (ours, theirs)
    # weights are a proper distribution
    np.testing.assert_allclose(np.asarray(params.weights).sum(), 1.0,
                               atol=1e-5)


def test_gmm_full_covariance():
    X = synth_mixture(seed=1)
    params, info = gmm.fit(jax.random.PRNGKey(1), jnp.asarray(X), 3,
                           covariance_type="full")
    sk = GaussianMixture(3, covariance_type="full", random_state=0).fit(X)
    ours = float(gmm.score(params, jnp.asarray(X), "full"))
    assert abs(ours - sk.score(X)) < 0.05


def test_gmm_score_samples_matches_sklearn_formula():
    """Evaluate OUR density vs sklearn's on identical parameters."""
    X = synth_mixture(seed=2, n=300)
    sk = GaussianMixture(3, covariance_type="diag", random_state=0).fit(X)
    params = gmm.GMMParams(jnp.asarray(sk.weights_, jnp.float32),
                           jnp.asarray(sk.means_, jnp.float32),
                           jnp.asarray(sk.covariances_, jnp.float32))
    ours = np.asarray(gmm.score_samples(params, jnp.asarray(X), "diag"))
    theirs = sk.score_samples(X)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-3)


def test_gmm_sampling_statistics():
    means = jnp.array([[-5.0, 0.0], [5.0, 0.0]])
    params = gmm.GMMParams(jnp.array([0.25, 0.75]), means,
                           jnp.ones((2, 2)) * 0.01)
    z = np.asarray(gmm.sample(jax.random.PRNGKey(0), params, 20000, "diag"))
    frac_right = (z[:, 0] > 0).mean()
    assert abs(frac_right - 0.75) < 0.02


def test_logreg_matches_sklearn():
    rng = np.random.default_rng(0)
    n, d = 800, 12
    w_true = rng.normal(size=d)
    X = rng.normal(size=(n, d)).astype(np.float32)
    y = (X @ w_true + 0.5 * rng.normal(size=n) > 0).astype(np.float32)

    ours, n_iter = logreg.fit(jnp.asarray(X), jnp.asarray(y))
    sk = LogisticRegression(solver="lbfgs", max_iter=200).fit(X, y)
    np.testing.assert_allclose(np.asarray(ours.w), sk.coef_[0],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(ours.b), sk.intercept_[0], atol=1e-3)
    p_ours = np.asarray(logreg.predict_proba(ours, jnp.asarray(X)))
    p_sk = sk.predict_proba(X)
    np.testing.assert_allclose(p_ours, p_sk, atol=1e-3)


def test_fullQ_logpdf_closed_form():
    rng = np.random.default_rng(3)
    mu = rng.normal(size=(5, 4)).astype(np.float32)
    lv = rng.normal(scale=0.3, size=(5, 4)).astype(np.float32)
    q = density.fullQ(mu, lv)
    x = rng.normal(size=(4,)).astype(np.float32)
    # closed form: logsumexp of per-component diag gaussians, minus log N
    comp = [scipy.stats.multivariate_normal(mu[i], np.diag(np.exp(lv[i])))
            .logpdf(x) for i in range(5)]
    ref = scipy.special.logsumexp(comp) - np.log(5)
    ours = float(q.logpdf(x)[0])
    assert abs(ours - ref) < 1e-3


def test_gaussianQ_matches_scipy():
    rng = np.random.default_rng(4)
    mu = rng.normal(size=(200, 5)).astype(np.float32)
    lv = rng.normal(scale=0.2, size=(200, 5)).astype(np.float32)
    q = density.gaussianQ(mu, lv)
    cov = np.cov(mu.T, bias=True) + np.diag(np.exp(lv).mean(0))
    ref = scipy.stats.multivariate_normal(mu.mean(0), cov)
    x = rng.normal(size=(3, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(q.logpdf(x)), ref.logpdf(x),
                               rtol=1e-3, atol=1e-3)


def test_prior_logpdf():
    z = np.zeros(4, np.float32)
    ref = scipy.stats.multivariate_normal(np.zeros(4), np.eye(4)).logpdf(z)
    assert abs(float(density.prior_logpdf(z)[0]) - ref) < 1e-5


def test_evaluate_nll_sanity():
    rng = np.random.default_rng(5)
    mu = rng.normal(scale=0.1, size=(400, 8)).astype(np.float32)
    lv = np.full((400, 8), -2.0, np.float32)
    q = density.mogQ(mu, lv, n_components=5, z_num_samples=4,
                     key=jax.random.PRNGKey(0))
    nll_q, nll_p = density.evaluate_nll(q, (mu, lv), jax.random.PRNGKey(1))
    # points cluster near 0 with small var: a fitted Q must beat the prior
    assert nll_q < nll_p


def test_rejection_sampling_accept_rate():
    """Acceptance statistics must match the classifier probabilities."""
    rng = np.random.default_rng(6)
    d = 4
    mu = rng.normal(size=(500, d)).astype(np.float32)
    lv = np.full((500, d), -1.0, np.float32)
    q = density.mogQ(mu, lv, n_components=4, z_num_samples=2,
                     key=jax.random.PRNGKey(0))

    clf_amp = logreg.LogRegParams(w=jnp.zeros(d), b=jnp.asarray(0.0))
    clf_tox = logreg.LogRegParams(w=jnp.zeros(d), b=jnp.asarray(2.0))
    # amp head: p=0.5 everywhere; tox head target 0: 1-sigmoid(2)~0.119
    q.init_attr_classifiers({"amp": clf_amp, "tox": clf_tox},
                            {"amp": 1, "tox": 0})
    z, scores, accept = q.rejection_sample(jax.random.PRNGKey(2), 40000)
    rate = float(np.asarray(accept).mean())
    expected = 0.5 * (1 - 1 / (1 + np.exp(-2.0)))
    assert abs(rate - expected) < 0.01
    assert np.allclose(np.asarray(scores["clfZ_prob_accum"]),
                       expected, atol=1e-4)
    assert z.shape == (40000, d)


def test_accepted_z_compaction():
    z = jnp.arange(10.0)[:, None]
    accept = jnp.array([0, 1, 0, 1, 1, 0, 0, 0, 1, 0], bool)
    zacc, count = class_sampler.accepted_z(z, accept, 8)
    assert int(count) == 4
    np.testing.assert_array_equal(np.asarray(zacc[:4, 0]), [1, 3, 4, 8])


def test_gmm_tied_covariance():
    """'tied' (one shared [D,D]): fit NLL parity vs sklearn, density parity
    on identical parameters, and sampling through the shared Cholesky."""
    X = synth_mixture(seed=3)
    params, info = gmm.fit(jax.random.PRNGKey(2), jnp.asarray(X), 3,
                           covariance_type="tied")
    assert params.covars.shape == (X.shape[1], X.shape[1])
    sk = GaussianMixture(3, covariance_type="tied", random_state=0).fit(X)
    ours = float(gmm.score(params, jnp.asarray(X), "tied"))
    assert abs(ours - sk.score(X)) < 0.05, (ours, sk.score(X))

    # density on identical parameters
    params_sk = gmm.GMMParams(jnp.asarray(sk.weights_, jnp.float32),
                              jnp.asarray(sk.means_, jnp.float32),
                              jnp.asarray(sk.covariances_, jnp.float32))
    mine = np.asarray(gmm.score_samples(params_sk, jnp.asarray(X), "tied"))
    np.testing.assert_allclose(mine, sk.score_samples(X), rtol=1e-4,
                               atol=1e-3)

    # sampling: covariance of draws matches the shared covariance
    z = np.asarray(gmm.sample(jax.random.PRNGKey(3), params, 40000, "tied"))
    assert z.shape == (40000, X.shape[1])
    assert np.isfinite(z).all()


def test_gmm_unknown_covariance_type_raises():
    X = jnp.asarray(synth_mixture(seed=4, n=60))
    with pytest.raises(ValueError):
        gmm.fit(jax.random.PRNGKey(0), X, 2, covariance_type="spherical")
    params = gmm.GMMParams(jnp.ones(2) / 2, jnp.zeros((2, 6)),
                           jnp.ones((2, 6)))
    with pytest.raises(ValueError):
        gmm.score_samples(params, X, "spherical")


def test_mogQ_tied_end_to_end():
    """mogQ(covariance_type='tied') powers logpdf/sample/rejection_round."""
    rng = np.random.default_rng(5)
    mu = rng.normal(size=(300, 8)).astype(np.float32)
    logvar = np.full((300, 8), -2.0, np.float32)
    Q = density.mogQ(mu, logvar, n_components=5, z_num_samples=2,
                     covariance_type="tied", key=jax.random.PRNGKey(4))
    lp = np.asarray(Q.logpdf(mu[:10]))
    assert np.isfinite(lp).all()
    z = np.asarray(Q.sample(jax.random.PRNGKey(5), 64))
    assert z.shape == (64, 8)
    clf, _ = logreg.fit(jnp.asarray(mu), jnp.asarray(
        (mu[:, 0] > 0).astype(np.float32)))
    Q.init_attr_classifiers({"amp": clf}, {"amp": 1})
    zs, scores, accept = Q.rejection_sample(jax.random.PRNGKey(6), 128)
    assert zs.shape == (128, 8)
    assert accept.dtype == bool or accept.dtype == np.bool_


def test_logreg_separable_data_stays_finite():
    """Linearly separable inputs saturate the sigmoids and zero out the
    unpenalized-intercept row of the Newton Hessian; the damped/backtracked
    solver must stay finite (this exact failure produced NaN AUCs in the
    latent-discriminator battery on heavily overfit encoders)."""
    rng = np.random.default_rng(7)
    X = np.concatenate([rng.normal(size=(50, 16)) + 8.0,
                        rng.normal(size=(50, 16)) - 8.0]).astype(np.float32)
    y = np.concatenate([np.ones(50), np.zeros(50)]).astype(np.float32)
    ours, n_iter = logreg.fit(jnp.asarray(X), jnp.asarray(y))
    assert np.isfinite(np.asarray(ours.w)).all()
    assert np.isfinite(float(ours.b))
    p = np.asarray(logreg.predict_proba(ours, jnp.asarray(X)))
    assert np.isfinite(p).all()
    assert float(logreg.accuracy(ours, jnp.asarray(X), jnp.asarray(y))) == 1.0
    sk = LogisticRegression(solver="lbfgs", max_iter=500).fit(X, y)
    np.testing.assert_allclose(np.asarray(ours.w), sk.coef_[0],
                               rtol=5e-2, atol=5e-2)
