
import pytest

pytestmark = pytest.mark.quick
import argparse
import json

from controlled_peptide_generation_tpu import config as C


def test_defaults_match_reference_contract():
    cfg = C.default_config()
    assert cfg.vae.batch_size == 32
    assert cfg.vae.n_iter == 200000
    assert cfg.vae.z_regu_loss == "mmdrf"
    assert cfg.model.z_dim == 100
    assert cfg.model.emb_dim == 150
    assert cfg.model.E_args.h_dim == 80
    assert cfg.max_seq_len == 25
    assert cfg.losses.wae_mmd.sigma == 7.0
    assert cfg.shared.clip_grad == 5.0


def test_dotted_cli_flags_roundtrip():
    cfg = C.default_config()
    parser = argparse.ArgumentParser()
    C.fill_parser(parser, cfg)
    args = parser.parse_args([
        "--vae.batch_size", "8", "--runname", "t1",
        "--vae.beta.end.val", "3.5", "--tiny", "1",
    ])
    applied = C.override_from_args(cfg, args)
    assert cfg.vae.batch_size == 8
    assert cfg.runname == "t1"
    assert cfg.vae.beta.end.val == 3.5
    assert cfg.tiny is True
    assert applied["vae.batch_size"] == 8


def test_json_roundtrip(tmp_path):
    cfg = C.default_config()
    cfg.vae.lr = 5e-4
    C.save_config({"vae.lr": 5e-4}, cfg, str(tmp_path))
    complete = json.load(open(tmp_path / "config_complete.json"))
    assert complete["vae.lr"] == 5e-4

    cfg2 = C.default_config()
    C.override_from_json(cfg2, str(tmp_path / "config_complete.json"))
    assert cfg2.vae.lr == 5e-4


def test_tiny_profile_and_finalize(tmp_path):
    cfg = C.default_config()
    cfg.tiny = True
    cfg.savepath_toplevel = str(tmp_path / "out")
    cfg.tb_toplevel = str(tmp_path / "tb")
    C.finalize(cfg)
    assert cfg.vae.n_iter == 100
    assert cfg.vae.batch_size == 5
    assert cfg.vae.cheaplog_every == 10
    assert cfg.vae.expsvlog_every == 25
    assert cfg.evals.sample_size == 30
    assert cfg.vae.clip_grad == 5.0          # shared injected
    assert cfg.loadpath == ""                # fresh start
    assert cfg.vocab_path.endswith("vocab.dict")
    assert cfg.vae.chkpt_path.endswith("model_{}.npz")


def test_override_n_iter_rederives_schedules():
    """--vae.n_iter must propagate into full.s_iter, the beta/softmax
    anneal iters and the phase-2 auto-loadpath (deviation: the reference
    derives these once at module import, cfg.py:188-227, so an override
    there leaves phase 2 pointing at a checkpoint that was never
    written)."""
    cfg, _, _ = C.parse_and_finalize(["--vae.n_iter", "1000",
                                      "--phase", "2"])
    assert cfg.full.s_iter == 1000
    assert cfg.loadpath.endswith("model_1000.npz")
    assert cfg.vae.beta.end.iter == 200            # n_iter // 5
    assert cfg.full.beta.start.iter == 1000
    assert cfg.full.beta.end.iter == 1000 + cfg.full.n_iter
    assert cfg.full.softmax_temp.end.iter == 1000 + cfg.full.n_iter


def test_explicit_schedule_override_wins_over_rederive():
    cfg, _, _ = C.parse_and_finalize(["--vae.n_iter", "1000",
                                      "--full.s_iter", "777"])
    assert cfg.full.s_iter == 777
    assert cfg.full.beta.start.iter == 777         # derived from kept value


def test_part_resume_autoload(tmp_path):
    cfg = C.default_config()
    cfg.phase = 1
    cfg.partN = 4
    cfg.part = 1
    seed0 = cfg.seed
    C.finalize(cfg)
    assert cfg.vae.n_iter == 50000
    assert cfg.vae.s_iter == 50000
    assert cfg.loadpath.endswith("model_50000.npz")
    assert cfg.seed == seed0 + 1
