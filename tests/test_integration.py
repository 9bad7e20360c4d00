"""End-to-end integration: tiny train -> state dump -> CLaSS pipeline ->
static-eval battery. This is the rebuild's equivalent of the reference's
run.sh smoke path (main.py + static_eval.py under --tiny)."""

import argparse
import os

import jax
import numpy as np
import pytest

import main as main_mod
import static_eval as se_mod
from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu import pipeline
from controlled_peptide_generation_tpu.api import (
    load_trained_model, load_vocab, get_model_and_vocab_path)
from controlled_peptide_generation_tpu.vis import build_index, covar, kde


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    argv = ["--tiny", "1", "--dataset", "synthetic", "--runname", "e2e",
            "--phase", "1",
            "--savepath_toplevel", str(base / "out"),
            "--tb_toplevel", str(base / "tb"),
            "--datapath", str(base / "data")]
    cfg = main_mod.main(argv)
    return cfg, argv


def _load(cfg):
    model_path, vocab_path, base = get_model_and_vocab_path(cfg)
    vocab = load_vocab(vocab_path)
    model, params = load_trained_model(model_path, vocab.size(), cfg)
    return model, params, vocab, base


def test_training_artifacts(trained_run):
    cfg, _ = trained_run
    assert os.path.exists(os.path.join(cfg.savepath, "model_100.npz"))
    assert os.path.exists(os.path.join(cfg.savepath, "result.json"))
    assert os.path.exists(cfg.vae.gen_samples_path)
    with open(cfg.vae.gen_samples_path) as fh:
        lines = [ln for ln in fh.read().splitlines()]
    assert len(lines) == cfg.evals.sample_size
    # loss decreased over the tiny run
    import json
    rows = json.load(open(os.path.join(cfg.savepath, "result.json")))
    assert rows[-1]["train_L_vae_recon"] < rows[0]["train_L_vae_recon"]


def test_state_dump_and_pipeline(trained_run):
    cfg, _ = trained_run
    model, params, vocab, base = _load(cfg)
    dataset = main_mod.load_dataset(cfg)
    paths = build_index.extract_from_dataset(
        model, params, vocab, cfg, dataset, base, cfg.vae.n_iter,
        max_examples=300)
    for split in ("train", "val", "test"):
        assert os.path.exists(paths[split])
    states = build_index.read_states(paths["train"])
    assert states["mu"].shape[1] == cfg.model.z_dim
    assert states["src"].shape[1] == cfg.max_seq_len
    assert states["label"].shape[1] == len(C.dataset_spec(cfg)["attributes"])

    # exact MIPS index matches brute-force inner-product top-k
    idx = build_index.LatentIndex.from_states(paths["train"])
    q = states["z"][:5].astype(np.float32)
    scores, top = idx.search(q, k=3)
    ref_sims = q @ states["z"].astype(np.float32).T
    ref_scores = np.sort(ref_sims, axis=1)[:, ::-1][:, :3]
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-4)

    # persisted index artifact (reference index_{iter}.faiss contract,
    # vis/scripts/build_index.py:174-176): save/load round-trips without
    # the states h5 and returns identical search results
    ipath = build_index.index_path(base, cfg.vae.n_iter)
    idx.save(ipath)
    assert os.path.exists(ipath)
    idx2 = build_index.LatentIndex.load(ipath)
    scores2, top2 = idx2.search(q, k=3)
    np.testing.assert_allclose(scores2, scores, rtol=1e-6)
    np.testing.assert_array_equal(top2, top)

    # CLaSS pipeline end to end (small rounds)
    args = argparse.Namespace(
        Q_n_components=8, Q_covariance_type="diag",
        n_samples_per_round=64, n_samples_acc=5,
        samples_outfn_prefix="testsamples",
        Q_select_amppos=0, Q_from_full_dataloader=False)
    outfn = pipeline.run(cfg, args)
    assert os.path.exists(outfn + ".csv")
    assert os.path.exists(outfn + ".plain.txt")
    import pandas as pd
    df = pd.read_pickle(outfn + ".pkl")
    assert {"peptide", "z", "accept_z", "accept", "H", "uH",
            "charge"}.issubset(df.columns)
    assert df["accept"].sum() >= 5


def test_static_eval_battery(trained_run, capsys):
    cfg, _ = trained_run
    model, params, vocab, base = _load(cfg)
    se_mod.test_interpolated_peptides(model, params, vocab)
    se_mod.test_sampling(model, params, vocab, n_samples=2)
    se_mod.test_interpolated_z(model, params, vocab)
    se_mod.test_reconstruction(model, params, vocab, "M K T A, K L L K")
    se_mod.test_reconstruction_interpol(model, params, vocab,
                                        "M K T A, K L L K")
    out = capsys.readouterr().out
    assert "INTERPOLATING" not in out  # log lines go to logging, not stdout
    assert "reco of" in out
    assert "hyp" in out  # beam hypotheses printed


def test_vis_diagnostics(trained_run):
    cfg, _ = trained_run
    base = cfg.savepath
    fnames = {s: build_index.states_path(base, s, cfg.vae.n_iter)
              for s in ("train", "val", "test")}
    frob_pos, frob_unl = covar.eval(fnames)
    assert np.isfinite(frob_pos) and np.isfinite(frob_unl)
    attrs = C.dataset_spec(cfg)["attributes"]
    res = kde.eval(fnames, attrs)
    assert res  # produced at least one subset diagnostic


def test_part_resume_contract(tmp_path):
    """part/partN split training (reference cfg.py:93-101,112-117): part 0
    trains the first slice; part 1 auto-loads part 0's final checkpoint and
    CONTINUES (Adam moments included — the reference silently reset them).

    Not combined with --tiny: the reference applies the partN split BEFORE
    the tiny profile overwrites n_iter (cfg.py:86-104), making tiny+partN
    incoherent there too — we preserve that ordering, so the test drives
    explicit small iteration counts instead."""
    base = ["--dataset", "synthetic", "--runname", "parts",
            "--phase", "1", "--partN", "2",
            "--vae.n_iter", "40", "--vae.expsvlog_every", "20",
            "--vae.cheaplog_every", "10", "--vae.batch_size", "5",
            "--evals.sample_size", "8", "--resume_result_json", "0",
            "--savepath_toplevel", str(tmp_path / "out"),
            "--tb_toplevel", str(tmp_path / "tb"),
            "--datapath", str(tmp_path / "data")]
    cfg0 = main_mod.main(base + ["--part", "0"])
    assert cfg0.vae.s_iter == 0 and cfg0.vae.n_iter == 20
    assert os.path.exists(cfg0.vae.chkpt_path.format(20))
    assert not os.path.exists(cfg0.vae.chkpt_path.format(40))

    cfg1 = main_mod.main(base + ["--part", "1"])
    assert cfg1.vae.s_iter == 20
    assert cfg1.loadpath == cfg1.vae.chkpt_path.format(20)
    assert os.path.exists(cfg1.vae.chkpt_path.format(40))
    # the resumed checkpoint carries optimizer state + step
    import numpy as np
    raw = np.load(cfg1.vae.chkpt_path.format(40), allow_pickle=False)
    assert any("'opt'" in k for k in raw.files)
    assert int(raw["['step']"]) == 40


def test_pipeline_Q_from_dataloader_and_amppos(trained_run):
    """The Q_from_full_dataloader path: Q fit on amp-positive encoder
    means pulled straight from the dataloader (reference
    sample_pipeline.py:47-71), with eval NLL points still read from the
    states dump (reference quirk, sample_pipeline.py:115-118)."""
    cfg, _ = trained_run
    model, params, vocab, base = _load(cfg)
    dataset = main_mod.load_dataset(cfg)
    build_index.extract_from_dataset(
        model, params, vocab, cfg, dataset, base, cfg.vae.n_iter,
        max_examples=300)
    args = argparse.Namespace(
        Q_n_components=4, Q_covariance_type="diag",
        n_samples_per_round=64, n_samples_acc=5,
        samples_outfn_prefix="dlsamples",
        Q_select_amppos=1, Q_from_full_dataloader=True)
    outfn = pipeline.run(cfg, args)
    assert os.path.exists(outfn + ".csv")


def test_pipeline_accepted_only_decode(trained_run):
    """hw.decode_mode="accepted" runs the whole pipeline decoding only
    accepted candidates: every output row is accepted, and the artifact
    schema is unchanged."""
    cfg, _ = trained_run
    model, params, vocab, base = _load(cfg)
    dataset = main_mod.load_dataset(cfg)
    build_index.extract_from_dataset(
        model, params, vocab, cfg, dataset, base, cfg.vae.n_iter,
        max_examples=300)
    cfg = cfg.copy()
    cfg.hw.decode_mode = "accepted"
    args = argparse.Namespace(
        Q_n_components=4, Q_covariance_type="diag",
        n_samples_per_round=64, n_samples_acc=5,
        samples_outfn_prefix="acceptedsamples",
        Q_select_amppos=0, Q_from_full_dataloader=False)
    outfn = pipeline.run(cfg, args)
    import pandas as pd
    df = pd.read_pickle(outfn + ".pkl")
    assert {"peptide", "z", "accept_z", "accept", "H", "uH",
            "charge"}.issubset(df.columns)
    assert df["accept"].all() and len(df) >= 5
    assert df["peptide"].is_unique
    # z column carries real compacted latent rows
    assert df["z"].iloc[0].shape == (cfg.model.z_dim,)
    # the accepted file equals the full file in this mode
    accepted = pd.read_pickle(
        f"{outfn}.accepted.{len(df)}.pkl")
    assert len(accepted) == len(df)


def test_pipeline_dp_mesh_rounds(trained_run):
    """hw.dp shards the fused CLaSS rounds over the device mesh inside
    pipeline.run (parallel.dp_fused_round)."""
    cfg, _ = trained_run
    model, params, vocab, base = _load(cfg)
    dataset = main_mod.load_dataset(cfg)
    build_index.extract_from_dataset(
        model, params, vocab, cfg, dataset, base, cfg.vae.n_iter,
        max_examples=300)
    cfg = cfg.copy()
    cfg.hw.dp = 4
    args = argparse.Namespace(
        Q_n_components=4, Q_covariance_type="diag",
        n_samples_per_round=64, n_samples_acc=5,
        samples_outfn_prefix="dpsamples",
        Q_select_amppos=0, Q_from_full_dataloader=False)
    outfn = pipeline.run(cfg, args)
    assert os.path.exists(outfn + ".csv")
    import pandas as pd
    df = pd.read_pickle(outfn + ".pkl")
    assert df["accept"].sum() >= 5


def test_pipeline_dp_mesh_accepted_only(trained_run):
    """Mesh-sharded rounds compose with hw.decode_mode="accepted": the
    capacity is rounded onto the mesh and every output row is accepted."""
    cfg, _ = trained_run
    model, params, vocab, base = _load(cfg)
    dataset = main_mod.load_dataset(cfg)
    build_index.extract_from_dataset(
        model, params, vocab, cfg, dataset, base, cfg.vae.n_iter,
        max_examples=300)
    cfg = cfg.copy()
    cfg.hw.dp = 4
    cfg.hw.decode_mode = "accepted"
    args = argparse.Namespace(
        Q_n_components=4, Q_covariance_type="diag",
        n_samples_per_round=64, n_samples_acc=5,
        samples_outfn_prefix="dpaccsamples",
        Q_select_amppos=0, Q_from_full_dataloader=False)
    outfn = pipeline.run(cfg, args)
    import pandas as pd
    df = pd.read_pickle(outfn + ".pkl")
    assert df["accept"].all() and len(df) >= 5
    assert df["peptide"].is_unique


@pytest.mark.parametrize("qclass", ["fullQ", "gaussianQ"])
def test_pipeline_qclass_live(trained_run, qclass):
    """--QClass selects the density family end to end. The reference
    parses the flag but never reads it (sample_pipeline.py:333 vs its
    module-level Q_CLASS at :36); here all three families are
    fused-round compatible, so the flag is live."""
    cfg, _ = trained_run
    model, params, vocab, base = _load(cfg)
    dataset = main_mod.load_dataset(cfg)
    build_index.extract_from_dataset(
        model, params, vocab, cfg, dataset, base, cfg.vae.n_iter,
        max_examples=300)
    args = argparse.Namespace(
        QClass=qclass,
        Q_n_components=4, Q_covariance_type="diag",
        n_samples_per_round=64, n_samples_acc=5,
        samples_outfn_prefix=f"qc_{qclass}",
        Q_select_amppos=0, Q_from_full_dataloader=False)
    outfn = pipeline.run(cfg, args)
    import pandas as pd
    df = pd.read_pickle(outfn + ".pkl")
    assert df["accept"].sum() >= 5


def test_resolve_qclass():
    assert pipeline.resolve_QClass("mogQ").__name__ == "mogQ"
    assert pipeline.resolve_QClass("fullQ").__name__ == "fullQ"
    assert pipeline.resolve_QClass("gaussianQ").__name__ == "gaussianQ"
    with pytest.raises(ValueError, match="unknown QClass"):
        pipeline.resolve_QClass("nopeQ")


def test_fitQ_and_test_filters_kwargs_per_class(trained_run):
    """fitQ_and_test drops mogQ-only kwargs for families whose __init__
    doesn't accept them (fullQ/gaussianQ), instead of crashing."""
    cfg, _ = trained_run
    from controlled_peptide_generation_tpu.latent import density
    qkw = {"n_components": 4, "z_num_samples": 10,
           "covariance_type": "diag"}
    for QClass in (density.fullQ, density.gaussianQ):
        Q, metrics = pipeline.fitQ_and_test(cfg, QClass, qkw, {})
        assert isinstance(Q, QClass)
        assert set(metrics) == {"a,tr", "a,hld"}


def test_fused_loop_oom_halves_and_retries(trained_run, monkeypatch):
    """A compile-time RESOURCE_EXHAUSTED in a fused-round launch halves the
    dispatch and retries instead of dying (the transformer lane-budget
    clamp's backstop, pipeline._fused_sampling_loop)."""
    cfg, _ = trained_run
    model, params, vocab, base = _load(cfg)
    dataset = main_mod.load_dataset(cfg)
    build_index.extract_from_dataset(
        model, params, vocab, cfg, dataset, base, cfg.vae.n_iter,
        max_examples=300)
    calls = []
    real = pipeline.launch_round

    def flaky(cfg_, model_, params_, Q_, n, key, fused=True, mesh=None):
        calls.append(n)
        if len(calls) == 1:
            # must be jax's own runtime error type: is_device_oom
            # deliberately rejects arbitrary exceptions that merely
            # mention memory (and newer jax no longer aliases
            # JaxRuntimeError to RuntimeError)
            import jax
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory allocating 99 bytes")
        return real(cfg_, model_, params_, Q_, n, key, fused=fused,
                    mesh=mesh)

    monkeypatch.setattr(pipeline, "launch_round", flaky)
    cfg = cfg.copy()
    cfg.hw.rounds_per_dispatch = 2
    args = argparse.Namespace(
        Q_n_components=4, Q_covariance_type="diag",
        n_samples_per_round=32, n_samples_acc=3,
        samples_outfn_prefix="oomsamples",
        Q_select_amppos=0, Q_from_full_dataloader=False)
    outfn = pipeline.run(cfg, args)
    assert os.path.exists(outfn + ".csv")
    assert calls[0] == 64 and calls[1] == 32  # halved once, then ran


def test_oom_shrink_stops_at_zero(monkeypatch):
    """A non-OOM error, or an OOM that can't shrink further, re-raises."""
    import jax
    from collections import deque
    # direct exercise of the retry loop via a 1-candidate round
    cfg = C.default_config()
    calls = []

    def always_oom(*a, **kw):
        calls.append(1)
        # a REAL OOM type (see flaky above): exercises the
        # oom-but-cannot-shrink path, not just the non-OOM re-raise
        raise jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: Out of memory")

    monkeypatch.setattr(pipeline, "launch_round", always_oom)
    args = argparse.Namespace(n_samples_acc=1, n_samples_per_round=1)
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        pipeline._fused_sampling_loop(cfg, args, None, None, None, None,
                                      jax.random.PRNGKey(0), 1, None)
    assert len(calls) == 1  # size-1 dispatch cannot halve: no retry loop
