"""Serving layer: demand coalescing, lifetime-unique samples, HTTP API.

The server wraps the same fused CLaSS round as the batch pipeline
(pipeline.launch_round), so device-path correctness is covered by
test_fusion/test_integration; these tests exercise the serving contract —
blocking generate(), cross-request dedup, concurrency, timeouts, and the
stdlib HTTP front-end."""

import argparse
import json
import threading
import urllib.request

import pytest

import main as main_mod
from controlled_peptide_generation_tpu import config as C
from controlled_peptide_generation_tpu import serve as S
from controlled_peptide_generation_tpu.api import (
    load_trained_model, load_vocab, get_model_and_vocab_path)
from controlled_peptide_generation_tpu.vis import build_index


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    """Tiny trained run -> state dump -> built + started GenerationServer."""
    base = tmp_path_factory.mktemp("serve")
    argv = ["--tiny", "1", "--dataset", "synthetic", "--runname", "serve",
            "--phase", "1",
            "--savepath_toplevel", str(base / "out"),
            "--tb_toplevel", str(base / "tb"),
            "--datapath", str(base / "data")]
    cfg = main_mod.main(argv)
    model_path, vocab_path, run_base = get_model_and_vocab_path(cfg)
    vocab = load_vocab(vocab_path)
    model, params = load_trained_model(model_path, vocab.size(), cfg)
    dataset = main_mod.load_dataset(cfg)
    build_index.extract_from_dataset(
        model, params, vocab, cfg, dataset, run_base, cfg.vae.n_iter,
        max_examples=300)
    args = argparse.Namespace(
        Q_n_components=8, Q_covariance_type="diag",
        n_samples_per_round=256, Q_select_amppos=0)
    srv = S.build_server(cfg, args)
    srv.round_size = 256
    srv.start()
    yield srv
    srv.stop()


def test_generate_unique_rows(server):
    rows = server.generate(4, timeout=300)
    assert len(rows) == 4
    peps = [r["peptide"] for r in rows]
    assert len(set(peps)) == 4
    for r in rows:
        assert {"peptide", "H", "uH", "charge",
                "clfZ_prob_accum"}.issubset(r)
        assert 0.0 <= r["clfZ_prob_accum"] <= 1.0
    # a second request never repeats the first's peptides (lifetime dedup)
    rows2 = server.generate(4, timeout=300)
    assert not set(peps) & {r["peptide"] for r in rows2}


def test_concurrent_requests_coalesce(server):
    results = {}

    def ask(name):
        results[name] = server.generate(3, timeout=300)

    threads = [threading.Thread(target=ask, args=(f"c{i}",))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    all_peps = [r["peptide"] for rows in results.values() for r in rows]
    assert len(all_peps) == 9
    assert len(set(all_peps)) == 9  # unique ACROSS requests
    stats = server.stats_snapshot()
    assert stats["served"] >= 9
    assert stats["accepted"] > 0 and stats["candidates"] > 0


def test_generate_timeout_and_validation(server):
    with pytest.raises(ValueError):
        server.generate(0)
    with pytest.raises(TimeoutError):
        # no round can complete in ~0 time; request must time out cleanly
        server.generate(10_000, timeout=1e-6)
    # the timed-out request must not wedge the queue
    assert server.generate(1, timeout=300)


def test_http_api(server):
    httpd = S.make_http_server(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"n": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["n"] == 2 and len(out["samples"]) == 2
        assert all("peptide" in s for s in out["samples"])

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["rounds"] >= 1 and stats["unique_seen"] >= 2

        # malformed: n out of range -> 400, unknown route -> 404
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"n": 0}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=30)
        assert ei.value.code == 404
    finally:
        httpd.shutdown()


def test_stop_fails_queued_requests():
    """stop() must make a blocked generate() raise, not return fewer than
    n rows as an apparent success."""
    import time
    import types

    class _EmptyRounds(S.GenerationServer):
        # device-side members are never touched: rounds yield nothing,
        # so a generate() stays queued until stop() cancels it
        def _launch_guarded(self, n):
            return n, time.perf_counter(), None

        def _finish_round(self, pending):
            time.sleep(0.05)
            return []

    srv = _EmptyRounds(
        cfg=types.SimpleNamespace(seed=0, hw=C.default_config().hw),
        model=types.SimpleNamespace(G_class="gru"), params=None,
        dataset=None, Q=None, round_size=8)
    srv.start()
    errs = {}

    def ask():
        try:
            srv.generate(5, timeout=30)
        except Exception as e:
            errs["e"] = e

    t = threading.Thread(target=ask)
    t.start()
    time.sleep(0.3)  # let the request enqueue
    srv.stop()
    t.join(10)
    assert isinstance(errs.get("e"), RuntimeError)
    # a post-stop generate() raises instead of hanging
    with pytest.raises(RuntimeError):
        srv.generate(1, timeout=1)


def test_timeout_recycles_partial_rows(server):
    """A timed-out request's rows go to the spare buffer and are handed to
    the next request without new device work (they are already deduped)."""
    # seed the spare buffer as a timed-out request would
    fake_rows = [{"peptide": f"__SPARE_{i}__", "H": 0.0, "uH": 0.0,
                  "charge": 0.0} for i in range(3)]
    with server._lock:
        # earlier tests' timed-out requests may have left real recycled
        # rows; clear so this test observes only its seeded ones
        server._spare.clear()
        server._spare.extend(fake_rows)
        rounds_before = server.stats["rounds"]
    rows = server.generate(3, timeout=300)
    assert [r["peptide"] for r in rows] == [r["peptide"] for r in fake_rows]
    assert server.stats["rounds"] == rounds_before  # no device round ran


def test_http_client_errors_are_400(server):
    httpd = S.make_http_server(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{port}/generate"
    try:
        for body in (b"{not json", json.dumps({"n": "abc"}).encode(),
                     json.dumps({"n": 1, "timeout": None}).encode(),
                     json.dumps([1, 2]).encode()):
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400, body
    finally:
        httpd.shutdown()


def test_round_sizes_respects_transformer_lane_budget():
    """Rounds are bounded to ONE round_size (the p99 contract — bursts
    pull MORE rounds in flight, never bigger rounds), and the transformer
    family's dispatch is further capped to the same KV-cache lane budget
    pipeline.run enforces (ADVICE round 2: the server previously bypassed
    the clamp and could compile-OOM under burst)."""
    import types
    from controlled_peptide_generation_tpu import pipeline

    cfg = types.SimpleNamespace(seed=0, hw=C.default_config().hw)
    cfg.hw.tfm_lane_budget_gb = 0.05   # deliberately tiny budget
    model = types.SimpleNamespace(
        G_class="transformer", max_seq_len=25,
        dec_tfm_args={"n_layers": 2, "d_model": 128})
    srv = S.GenerationServer(cfg=cfg, model=model, params=None,
                             dataset=None, Q=None, round_size=5000)
    budget = pipeline.transformer_dispatch_budget(cfg, model, 1)
    assert budget is not None and budget < 5000
    assert srv._round_size_bounded() <= max(budget, 1)
    # GRU family: no lane clamp — exactly one round_size, even for bursts
    gru = types.SimpleNamespace(G_class="gru")
    srv2 = S.GenerationServer(cfg=cfg, model=gru, params=None,
                              dataset=None, Q=None, round_size=5000)
    assert srv2._round_size_bounded() == 5000


def test_fatal_worker_error_fails_queued_requests(monkeypatch):
    """A non-OOM error in the round worker (e.g. an execution-time device
    failure) must fail every queued request loudly and stop the server —
    not kill the worker thread silently while clients block forever
    (ADVICE round 4, serve.py:317)."""
    import types

    cfg = types.SimpleNamespace(seed=0, hw=C.default_config().hw)
    gru = types.SimpleNamespace(G_class="gru")
    srv = S.GenerationServer(cfg=cfg, model=gru, params=None,
                             dataset=None, Q=None, round_size=16)

    def boom(*a, **k):
        raise RuntimeError("simulated execution-time device failure")

    monkeypatch.setattr(S.pipeline, "launch_round", boom)
    srv.start()
    with pytest.raises(RuntimeError, match="server stopped"):
        srv.generate(1, timeout=30)
    # the server is stopped: new requests are refused, not queued forever
    with pytest.raises(RuntimeError, match="not running"):
        srv.generate(1, timeout=1)
    assert "fatal_error" in srv.stats
    assert "simulated execution-time" in srv.stats["fatal_error"]
    srv.stop()


def test_execution_oom_shrinks_round_and_recovers(monkeypatch):
    """An execution-time RESOURCE_EXHAUSTED (surfacing at
    block_until_ready in _finish_round) gets the same halve-and-retry
    backstop as dispatch-time OOMs: the round cap shrinks and the queued
    request is still served."""
    import types
    import numpy as np

    cfg = types.SimpleNamespace(seed=0, hw=C.default_config().hw)
    gru = types.SimpleNamespace(G_class="gru")
    srv = S.GenerationServer(cfg=cfg, model=gru, params=None,
                             dataset=None, Q=None, round_size=16)
    calls = {"n": 0}

    class FakeOOM(Exception):
        pass

    def fake_launch(cfg_, model_, params_, Q_, n, key, fused, mesh):
        calls["n"] += 1
        # (z, scores, accept, tokens, idx, valid); tokens row 0 decodes to
        # a fresh unique peptide each call
        tok = np.full((4, 6), 4 + calls["n"] % 20, np.int32)
        tok[:, 0] = 2
        tok[:, -1] = 3
        accept = np.array([True, False, False, False])
        return (None, {}, accept, tok, None, None)

    finishes = {"n": 0}

    def fake_finish_block(x):
        # the worker pre-dispatches the next round before finishing the
        # current one, so key the failure on FINISH order, not launches
        finishes["n"] += 1
        if finishes["n"] == 1:
            raise FakeOOM("RESOURCE_EXHAUSTED: simulated")
        return x

    monkeypatch.setattr(S.pipeline, "launch_round", fake_launch)
    monkeypatch.setattr(S.pipeline, "is_device_oom",
                        lambda e: isinstance(e, FakeOOM))
    monkeypatch.setattr(S.jax, "block_until_ready", fake_finish_block)
    monkeypatch.setattr(
        S.pipeline, "canonical_keys",
        lambda toks: [bytes(r) for r in np.asarray(toks)])
    monkeypatch.setattr(
        S, "modlamp_from_tokens",
        lambda toks, itos: (np.zeros(len(toks)), np.zeros(len(toks)),
                            np.zeros(len(toks))))
    srv.dataset = types.SimpleNamespace(
        idx2sentences=lambda toks, print_special_tokens: [
            "PEP" + str(int(t[1])) for t in toks],
        vocab=types.SimpleNamespace(itos=["<unk>", "<pad>", "<s>", "</s>"]
                                    + list("ACDEFGHIKLMNPQRSTVWY")))
    srv.start()
    rows = srv.generate(1, timeout=60)
    assert len(rows) == 1
    # round 1 OOMed at execution: the cap shrank and a retry succeeded
    assert srv._max_candidates is not None and srv._max_candidates < 16
    assert calls["n"] >= 2
    srv.stop()


def test_bounded_rounds_and_yield_estimates():
    """Every round is one round_size (bounded p99 policy; the in-flight
    queue depth comes from hw.rounds_in_flight), and the yield estimator
    applies conservative floors before any stats exist."""
    import types

    cfg = types.SimpleNamespace(seed=0, hw=C.default_config().hw)
    gru = types.SimpleNamespace(G_class="gru")
    srv = S.GenerationServer(cfg=cfg, model=gru, params=None,
                             dataset=None, Q=None, round_size=5000)
    rates = srv._rates_locked()
    assert srv._round_size_bounded() == 5000
    assert srv._depth == int(cfg.hw.rounds_in_flight) + 1
    # no data yet: 5% acceptance floor, uniqueness optimistic at 1.0
    assert srv._expected_yield(1000, rates) == pytest.approx(1000 * 0.05)
    srv.stats.update(candidates=1000, accepted=400, duplicates=40)
    rates = srv._rates_locked()
    assert srv._expected_yield(1000, rates) == pytest.approx(
        1000 * 0.4 * 0.9)
