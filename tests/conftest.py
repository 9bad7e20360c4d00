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

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def synthetic_corpus(tmp_path_factory):
    from controlled_peptide_generation_tpu.data import synthetic
    path = tmp_path_factory.getbasetemp() / "synthetic_data"
    synthetic.ensure(str(path), n_unlab=300, n_amp=120, n_tox=120)
    return str(path)
