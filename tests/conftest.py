"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-device sharding is validated without TPU hardware the standard way:
XLA_FLAGS=--xla_force_host_platform_device_count=8 on the CPU backend.
The env in this image pre-registers an 'axon' TPU platform at interpreter
start, so selecting CPU must go through jax.config (env vars are too late).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# CPG_TEST_PLATFORM=default leaves the env's platform in place (the real
# TPU on this image) — that is how the on-hardware property tests run:
#   CPG_TEST_PLATFORM=default python -m pytest tests/test_pallas_beam_tpu.py
# The Pallas suites (test_pallas.py, test_pallas_gru.py,
# test_pallas_beam.py, test_pallas_tfm_beam.py) are also hardware-clean:
# tolerance tests carry MXU-calibrated bounds and kernel-vs-XLA
# token-equality tests (an interpret-mode logic invariant — near-tie
# rows flip on the MXU) skip themselves on TPU. Suites comparing device
# compute against host oracles at fp32-tight tolerances (test_beam.py
# oracle, torch/sklearn parity) are CPU-by-design. Anything else is
# passed to jax.config verbatim; the default stays CPU so
# `pytest tests/` is hermetic and fast.
_plat = os.environ.get("CPG_TEST_PLATFORM", "cpu")
if _plat != "default":
    jax.config.update("jax_platforms", _plat)

import pytest  # noqa: E402


@pytest.fixture()
def synthetic_corpus(tmp_path_factory):
    from controlled_peptide_generation_tpu.data import synthetic
    path = tmp_path_factory.getbasetemp() / "synthetic_data"
    synthetic.ensure(str(path), n_unlab=300, n_amp=120, n_tox=120)
    return str(path)
