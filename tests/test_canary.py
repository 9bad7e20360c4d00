"""Runtime Pallas-beam miscompile canary (pipeline.beam_canary_check).

The round-4 tape scramble survived the offline divergence protocol and
scrambled production output silently; the canary catches the next
shape-dependent miscompile class IN PRODUCTION: a within-round collapse of
unique decoded sequences while the fused Pallas beam route is active trips
one WARNING, flips the process to the oracle-exact XLA arm, and discards
the suspect rounds. VERDICT r4 item 6."""

import threading
import types

import numpy as np
import pytest

from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu import pipeline
from controlled_peptide_generation_tpu import serve as S
from controlled_peptide_generation_tpu.models import build_model
from controlled_peptide_generation_tpu.ops import beam as beam_mod


@pytest.fixture()
def gru_model():
    cfg = C.default_config()
    return build_model(cfg.model, n_vocab=26, max_seq_len=25)


@pytest.mark.quick
def test_beam_canary_trips_once_and_flips_route(gru_model):
    cfg = C.default_config()
    beam_mod.set_pallas_beam(True)
    try:
        # healthy uniqueness: no trip
        assert not pipeline.beam_canary_check(cfg, gru_model, 1000, 500)
        # small rounds are exempt (too noisy)
        assert not pipeline.beam_canary_check(cfg, gru_model, 100, 1)
        # collapse on the Pallas route: trip + route flip
        assert pipeline.beam_canary_check(cfg, gru_model, 1000, 3)
        assert beam_mod.pallas_beam_enabled() is False
        # already on the XLA arm: a (real) collapsed model never re-trips
        assert not pipeline.beam_canary_check(cfg, gru_model, 1000, 3)
        # floor=0 disables entirely
        beam_mod.set_pallas_beam(True)
        cfg.hw.beam_canary_floor = 0.0
        assert not pipeline.beam_canary_check(cfg, gru_model, 1000, 1)
    finally:
        beam_mod.set_pallas_beam(None)


@pytest.mark.quick
def test_beam_canary_covers_transformer_kernel_route():
    """The transformer whole-scan kernel routes only when FORCED
    (--hw.pallas_beam on, ops/beam.py routing); the canary must protect
    that route too — a collapse there is the same miscompile class."""
    cfg = C.default_config()
    cfg.model.E_args.E_class = "transformer"
    cfg.model.G_args.G_class = "transformer"
    model = build_model(cfg.model, n_vocab=26, max_seq_len=25)
    from controlled_peptide_generation_tpu.ops import pallas_tfm_beam
    assert pallas_tfm_beam.applicable(model, pipeline.DECODE_BEAM_SIZE,
                                      "float32")
    beam_mod.set_pallas_beam(True)   # forced: the tfm kernel route
    try:
        assert pipeline.beam_canary_check(cfg, model, 1000, 3)
        assert beam_mod.pallas_beam_enabled() is False
        # on auto the tfm kernel never routes -> no trip (XLA arm is real)
        beam_mod.set_pallas_beam(None)
        assert not pipeline.beam_canary_check(cfg, model, 1000, 3)
    finally:
        beam_mod.set_pallas_beam(None)


def test_serve_canary_fallback_on_scrambled_tape(monkeypatch, gru_model):
    """Injected scrambled tape (all-duplicate rows) in a serve round:
    the round is discarded, the pre-dispatched round is dropped, the
    route flips to XLA, and the NEXT rounds still serve the demand."""
    cfg = types.SimpleNamespace(seed=0, hw=C.default_config().hw)
    srv = S.GenerationServer(cfg=cfg, model=gru_model, params=None,
                             dataset=None, Q=None, round_size=300)
    calls = {"launch": 0}
    finishes = {"n": 0}

    def fake_launch(cfg_, model_, params_, Q_, n, key, fused, mesh):
        calls["launch"] += 1
        return ("launch", calls["launch"], n)

    def fake_finish_payload(tag):
        finishes["n"] += 1
        n = tag[2]
        if finishes["n"] == 1:   # the scrambled round: every row equal
            tok = np.full((n, 8), 7, np.int32)
        else:                    # healthy: all rows distinct
            tok = np.zeros((n, 8), np.int32)
            i = np.arange(n)
            tok[:, 1] = 4 + (i % 20)
            tok[:, 2] = 4 + ((i // 20) % 20)
            tok[:, 3] = 4 + ((i // 400) % 20)
        tok[:, 0] = 2
        tok[:, -1] = 3
        accept = np.ones(n, bool)
        return (None, {}, accept, tok, None, None)

    orig_finish = S.GenerationServer._finish_round

    def finish_with_fake(self, pending):
        n, t0, tag = pending
        return orig_finish(self, (n, t0, fake_finish_payload(tag)))

    monkeypatch.setattr(S.pipeline, "launch_round", fake_launch)
    monkeypatch.setattr(S.GenerationServer, "_pack_round",
                        lambda self, out: out)  # tags pass through
    monkeypatch.setattr(S.GenerationServer, "_finish_round",
                        finish_with_fake)
    monkeypatch.setattr(
        S, "modlamp_from_tokens",
        lambda toks, itos: (np.zeros(len(toks)), np.zeros(len(toks)),
                            np.zeros(len(toks))))
    srv.dataset = types.SimpleNamespace(
        idx2sentences=lambda toks, print_special_tokens: [
            "P" + "".join(str(int(x)) for x in t[1:4]) for t in toks],
        vocab=types.SimpleNamespace(itos=["<unk>", "<pad>", "<s>", "</s>"]
                                    + list("ACDEFGHIKLMNPQRSTVWY")))
    beam_mod.set_pallas_beam(True)
    try:
        srv.start()
        rows = srv.generate(5, timeout=60)
        assert len(rows) == 5
        # the canary flipped the route off the Pallas arm
        assert beam_mod.pallas_beam_enabled() is False
        # round 1 (scrambled) contributed nothing: its peptides never
        # reached a client
        assert all(r["peptide"] != "P777" for r in rows)
        assert finishes["n"] >= 2
        srv.stop()
    finally:
        beam_mod.set_pallas_beam(None)
